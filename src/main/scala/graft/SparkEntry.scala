package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query catalogs; each catalog pairs a Spark
  * implementation with a DuckDB oracle SQL (where SQL-expressible).
  */
object SparkEntry {

  private def catalogs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.Relational.defs, operators.Relational.oracles),
      (operators.Windows.defs, operators.Windows.oracles),
      (operators.TextOps.defs, operators.TextOps.oracles),
      (operators.PipelineOps.defs, operators.PipelineOps.oracles),
      (operators.VectorOps.defs, operators.VectorOps.oracles),
      (operators.IvfIndex.defs, operators.IvfIndex.oracles),
      (operators.NexmarkQueries.defs, operators.NexmarkQueries.oracles),
      (operators.SqlShapes.defs, operators.SqlShapes.oracles),
      (operators.TpchLike.defs, operators.TpchLike.oracles),
      (operators.TpchFull.defs, operators.TpchFull.oracles),
      (operators.Multimodal.defs, operators.Multimodal.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.defs("q17_multi_join_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalogs.iterator.flatMap(_._2).toMap
}
