package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-provided parquet testdata
  * (see /root/repo/TESTDATA.md). Schemas are fixed and known; we read
  * with Spark's parquet scan so filters/column pruning push down
  * (reference keeps fixed declared schemas too — see SURVEY §1.3,
  * /root/reference/flock/src/datasource/tpch/mod.rs:24-122).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table. Parquet scan → Catalyst handles pushdown/pruning. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view (for spark.sql paths). */
  def views(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
