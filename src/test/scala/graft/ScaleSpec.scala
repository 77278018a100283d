package graft

import org.apache.spark.sql.functions._
import graft.plans.Scale
import graft.sources.Nexmark

class ScaleSpec extends SparkSpec {

  test("salted join equals plain join on skewed NEXMark data") {
    import spark.implicits._
    val bids = Nexmark.bids(spark, 20000).toDF()          // hot-auction skew
    val auctions = Nexmark.auctions(spark, 20000).toDF()
      .select($"a_id", $"category")
    val plain = bids.join(auctions, $"auction" === $"a_id")
      .groupBy($"category").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedJoin(
        bids.withColumnRenamed("auction", "a_id"), auctions, "a_id", 8)
      .groupBy($"category").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted count equals plain count per key") {
    import spark.implicits._
    val bids = Nexmark.bids(spark, 20000).toDF()
    val plain = bids.groupBy($"auction").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedCount(bids, "auction", 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("round-robin repartition and coalesce conserve rows (SURVEY §2.8)") {
    val li = Tables(spark, sfDir, "lineitem")
    val n = li.count()
    val rr = li.repartition(8) // RoundRobinPartitioning
    assert(rr.rdd.getNumPartitions == 8)
    assert(rr.count() == n)
    val co = rr.coalesce(2) // narrow, no shuffle
    assert(co.rdd.getNumPartitions == 2)
    assert(co.count() == n)
  }

  test("bucketed join plan has no shuffle exchange on either side") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables(spark, sfDir, "lineitem")
        .select($"l_orderkey", $"l_quantity")
      val o = Tables(spark, sfDir, "orders")
        .select($"o_orderkey", $"o_totalprice")
      Scale.writeBucketed(li, "li_b", "l_orderkey", 8)
      Scale.writeBucketed(o, "o_b", "o_orderkey", 8)
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), $"l_orderkey" === $"o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(900)}")
      // and it is value-correct vs the unbucketed join
      assert(joined.count() ==
        li.join(o, $"l_orderkey" === $"o_orderkey").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("tuned session config carries the flock.toml-analog knobs") {
    val c = graft.plans.Scale.tunedConf(7)
    assert(c("spark.sql.shuffle.partitions") == "7")
    assert(c("spark.io.compression.codec") == "zstd")
    assert(c("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(c("spark.sql.files.maxPartitionBytes").toLong == 128L * 1024 * 1024)
  }
}
