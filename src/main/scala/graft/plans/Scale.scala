package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale helpers for the shuffle-heavy paths (SURVEY §2.8; the prompt's
  * 100 TB mandates): key-salting for skewed joins and bucketing for
  * co-located joins. AQE's skew-join handles many cases at runtime; the
  * salted join is the explicit fallback when a build-side key is so hot
  * (NEXMark hot auctions are (id/100)*100) that even split partitions
  * overwhelm one task.
  */
object Scale {

  /** Salted inner equi-join for a skewed LEFT side: left rows get a random
    * salt in [0, parts); the (small-ish, replicable) RIGHT side is
    * exploded across all salts, so each hot key spreads over `parts`
    * tasks. Result equals the plain join row-for-row.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      parts: Int): DataFrame = {
    val salted = left.withColumn("__salt",
      (rand(seed = 42) * parts).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(parts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Pre-aggregate before a skewed grouped aggregation: partial combine on
    * (key, salt), then final combine on key — the manual form of Spark's
    * two-phase agg for pipelines that need an intermediate materialization.
    */
  def saltedCount(df: DataFrame, key: String, parts: Int): DataFrame =
    df.withColumn("__salt", (rand(seed = 42) * parts).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("cnt"))

  /** Write both sides bucketed by the join key so the join is co-located
    * (no Exchange on either side at read time). Requires a catalog table —
    * the analog of the reference's HashDiff pre-partitioning
    * (window/session.rs:250-254) done once at write time.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Cluster-tuned session configuration — the analog of the reference's
    * flock.toml knobs (SURVEY §6): zstd everywhere the reference used zstd
    * payloads (encoding.rs:52-56), scan split size in place of its
    * payload granules (flock.toml:59-61), AQE for runtime re-planning of
    * skew/partition-count (its Arena/HashDiff re-partitioning analog).
    * Shuffle-partition count is the caller's (cores × 2-3 locally; ~2-3×
    * total executor cores on a cluster).
    */
  def tunedConf(shufflePartitions: Int): Map[String, String] = Map(
    "spark.sql.shuffle.partitions" -> shufflePartitions.toString,
    "spark.io.compression.codec" -> "zstd",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.files.maxPartitionBytes" -> (128L * 1024 * 1024).toString,
    "spark.sql.parquet.compression.codec" -> "zstd",
    "spark.sql.session.timeZone" -> "UTC")

  def tuned(b: org.apache.spark.sql.SparkSession.Builder,
      shufflePartitions: Int): org.apache.spark.sql.SparkSession.Builder =
    tunedConf(shufflePartitions).foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
