package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-explicit file sources/sinks — the reference's ingest surface
  * (SURVEY §2.1): CSV side inputs (actor.rs:596-620 reads CSV against a
  * declared Arrow schema), JSON-lines event bytes parsed against a given
  * schema (transmute.rs:255-266), parquet sink (datasink/mod.rs:33).
  * Schemas are always declared, never inferred (SURVEY §1.3) — inference
  * is a full extra pass over the data and drifts types at scale.
  */
object FileSources {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .json(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .json(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** ORC read — the second columnar interchange format warehouses hand
    * over (Hive/Trino-side exports). Spark's native vectorized ORC
    * reader: column pruning and predicate pushdown work exactly as for
    * parquet (pinned in FileFormatsSpec), so a downstream query plans
    * identically against either format. Schema declared, never inferred.
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** ORC sink (zlib, the interchange default). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zlib").orc(path)

  /** Partitioned parquet sink (NEXMark q10's date-partitioned log). */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Streaming file source over a landing directory — the S3-drop ingest
    * pattern (the reference's S3 hand-off baseline, SURVEY §2.8 row
    * "S3-communication baseline"). New files become micro-batch input as
    * they arrive; `maxFilesPerTrigger` bounds per-batch work so one big
    * backlog drop cannot blow an executor. Schema declared, never
    * inferred (SURVEY §1.3).
    */
  def streamParquet(spark: SparkSession, path: String, schema: StructType,
      maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(path)

  /** Streaming CSV landing-directory source (side-input refresh shape). */
  def streamCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, maxFilesPerTrigger: Int = 10): DataFrame =
    spark.readStream.schema(schema)
      .option("header", header.toString)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .csv(path)
}
