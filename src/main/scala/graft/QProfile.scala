package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextHashes

/** Stage-by-stage latency profile of the LSH dedup pipeline (local
  * iteration tool; not part of the driver contract).
  */
object QProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }

    // warmup
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    val k = 32; val bands = 8; val rows = k / bands
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("toks", split($"text", "\\s+"))
    def base = docs.filter($"doc_id" % 5 === 0)
      .select($"doc_id", array_sort(array_distinct($"toks")).as("set"))
      .withColumn("sig", TextHashes.minhashSig($"set", k, 1))
    def banded = base.select($"doc_id", size($"set").as("sz"),
      explode(expr(s"transform(sequence(0, ${bands - 1}), " +
        s"b -> xxhash64(b, slice(sig, b*$rows + 1, $rows)))")).as("bandhash"))
    def candIds = banded.as("a")
      .join(banded.as("b"),
        col("a.bandhash") === col("b.bandhash") && col("a.doc_id") < col("b.doc_id") &&
          lit(5) * least(col("a.sz"), col("b.sz")) >
            lit(4) * greatest(col("a.sz"), col("b.sz")))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()

    time("scan+tokenize") { docs.select(sum(size($"toks"))).head(); docs.count() }
    time("sets+sig") { base.write.format("noop").mode("overwrite").save(); base.count() }
    time("banded")(banded.count())
    time("cand_join+distinct")(candIds.count())
    // alternative candidate generation: group per bucket, explode pairs
    def candIds2 = banded
      .groupBy($"bandhash").agg(collect_list($"doc_id").as("ids"))
      .filter(size($"ids") > 1)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> filter(transform(ids, (y, j) -> " +
          "IF(j > i AND y > x, struct(x AS id1, y AS id2), " +
          "IF(j > i AND y < x, struct(y AS id1, x AS id2), null))), p -> p IS NOT NULL)))"
      )).as("p"))
      .select($"p.id1", $"p.id2")
      .distinct()
    time("cand_group_explode")(candIds2.count())
    time("cand_group_explode2")(candIds2.count())
    time("cand_join_again")(candIds.count())
    time("full_q33") {
      val df = operators.TextOps.defs("q33_minhash_lsh_pairs")(spark, sfDir)
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    time("full_q33_again") {
      val df = operators.TextOps.defs("q33_minhash_lsh_pairs")(spark, sfDir)
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    time("full_q61") {
      val df = operators.TextOps.defs("q61_minhash_md5")(spark, sfDir)
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    spark.stop()
  }
}
