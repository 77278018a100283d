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

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    // thresholds scaled down so the unit-test data triggers the same
    // runtime re-plan a hot key would at production scale
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one scorching key (40k rows) among 50 cold ones
      val left = spark.range(40000).select(lit(0L).as("k"), $"id".as("v"))
        .union(spark.range(500).select(($"id" % 50 + 1).as("k"), $"id".as("v")))
      val right = spark.range(51).select($"id".as("rk"), ($"id" * 10).as("rv"))
      val joined = left.join(right, $"k" === $"rk")
      // collect() executes THIS dataset's plan, finalizing the AQE re-plan
      // (count() would spawn a separate QueryExecution)
      assert(joined.collect().length == 40500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(1200))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("two-phase prefix sum (q73 packing) equals the single-window form") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val twoPhase = operators.TextOps.defs("q73_seq_pack")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val naive = Tables(spark, sfDir, "documents")
      .select($"doc_id", size(split($"text", "\\s+")).cast("long").as("n_tok"))
      .withColumn("cum_before",
        coalesce(sum($"n_tok").over(Window.orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", expr("cum_before div 4096"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("sum_tokens"))
      .orderBy($"bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(twoPhase == naive && twoPhase.nonEmpty)
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
