package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextHashes

/** Stage-by-stage latency profile of the q136/q143 span-dedup shape
  * (local iteration tool; not part of the driver contract):
  * scan+tokenize → window-hash explode → (hash,doc) partial agg →
  * distinct-doc window → rollup. Run with SPARK_GRAFT_SF_DIR set.
  */
object SpanProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("toks", split($"text", "\\s+"))

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[span] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }

    docs.count() // warmup

    time("scan+tokenize")(docs.select(sum(size($"toks"))).head().getLong(0))
    def hashed = docs.filter(size($"toks") >= 8)
      .select($"doc_id", explode(TextHashes.md5WindowPrefixes($"toks", 8)).as("h"))
    time("  +hash+explode")(hashed.select(count(lit(1))).head().getLong(0))
    def pairs = hashed.groupBy($"h", $"doc_id").agg(count(lit(1)).as("cnt"))
    time("  +groupBy(h,doc)")(pairs.select(count(lit(1))).head().getLong(0))
    import org.apache.spark.sql.expressions.Window
    def windowed = pairs.withColumn("nd",
      count(lit(1)).over(Window.partitionBy($"h")))
    time("  +count-window(h)")(windowed.select(count(lit(1))).head().getLong(0))
    time("full q136") {
      graft.SparkEntry.queries("q136_dup_span_coverage")(spark, sfDir).count()
    }
    time("full q143") {
      graft.SparkEntry.queries("q143_span_dedup_budget")(spark, sfDir).count()
    }
    spark.stop()
  }
}
