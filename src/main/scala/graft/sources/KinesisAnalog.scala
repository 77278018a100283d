package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Kinesis-analog source — the reference's Kinesis ingest surface
  * re-expressed Spark-first (SURVEY §2.1, the last source row beyond the
  * Kafka stub).
  *
  * The reference (flock/src/datasource/kinesis.rs:42-111) has two
  * executable pieces: `to_batch` concatenates each delivery's record
  * payloads as JSON-lines and parses them into Arrow batches, and
  * `create_event_source_mapping_request` declares the delivery contract
  * (batch size, max batching window, starting position, optional
  * per-delivery tumbling window). Neither needs AWS to be meaningful:
  * the first is a bytes→rows mapping, the second a trigger/batch-size
  * policy. Both map onto Spark directly —
  *
  *  - the bytes→rows mapping is `from_json` against a DECLARED schema
  *    over whatever record-shaped relation the transport hands us
  *    (Spark's real Kinesis connectors emit exactly the
  *    `(data binary, partitionKey, sequenceNumber,
  *    approximateArrivalTimestamp)` shape modeled here);
  *  - the delivery contract maps onto source options + a processing-time
  *    trigger on the streaming reader.
  *
  * The reference INFERS the JSON schema from the first record of each
  * delivery (kinesis.rs:95-98) — per-delivery inference drifts types
  * across deliveries and costs an extra parse pass; we require the schema
  * declared once, like every other source here (SURVEY §1.3).
  */
object KinesisAnalog {

  /** One record as a Kinesis consumer sees it (kinesis.rs `KinesisEvent`
    * record fields; same shape Spark's Kinesis connectors emit).
    */
  case class Record(partitionKey: String, sequenceNumber: String,
      approximateArrivalTimestamp: Timestamp, data: Array[Byte])

  /** Delivery contract analog of kinesis.rs:63-90's event-source-mapping
    * request: how many records per invocation, how long to gather before
    * invoking, where to start, and an optional per-delivery tumbling
    * window. Defaults mirror the reference's literal values.
    */
  case class EventSourceMapping(
      batchSize: Int = 10000,
      maxBatchingWindowSec: Int = 300,
      startingPosition: String = "LATEST",
      tumblingWindowSec: Option[Int] = None)

  /** Batch form of kinesis.rs:93-122 `to_batch`: one delivery's records →
    * rows. Payloads parse as JSON against the declared schema; the
    * transport metadata (key, sequence number, arrival time) stays
    * attached so downstream operators can dedup on sequence number or
    * window on arrival time. Corrupt payloads surface as a null `row`
    * struct (PERMISSIVE) instead of failing the delivery — callers that
    * want the reference's fail-fast can filter `row IS NULL` and throw.
    */
  def toBatch(spark: SparkSession, records: Seq[Record],
      schema: StructType): DataFrame = {
    import spark.implicits._
    val raw = records.map(r => (r.partitionKey, r.sequenceNumber,
      r.approximateArrivalTimestamp, new String(r.data, UTF_8)))
      .toDF("partition_key", "sequence_number", "arrival_ts", "payload")
    decodePayloads(raw, schema)
  }

  /** Row-level decode shared by the batch and streaming paths: parse the
    * `payload` string column against the schema and flatten its fields
    * next to the transport metadata. Pure projection — codegen'd, no
    * shuffle, safe at any scale.
    */
  def decodePayloads(df: DataFrame, schema: StructType): DataFrame = {
    val cols = df.columns.filter(_ != "payload").map(col) :+
      from_json(col("payload"), schema).as("row")
    df.select(cols.toIndexedSeq: _*).select(col("*"), col("row.*")).drop("row")
  }

  /** Same decode for connectors that hand payload BYTES (Spark's Kinesis
    * connectors emit `data: binary`): cast then parse.
    */
  def decodeRecords(df: DataFrame, schema: StructType): DataFrame =
    decodePayloads(df.withColumn("payload", col("data").cast("string"))
      .drop("data"), schema)

  /** Streaming form over a landing directory — the no-AWS transport: each
    * file dropped in `dir` is one shard delivery of JSON-line payloads
    * (exactly the byte layout `to_batch` builds at kinesis.rs:101-113).
    * `batchSize` bounds files-per-trigger so a backlog drop cannot blow a
    * micro-batch; `startingPosition` TRIM_HORIZON replays existing files
    * while LATEST (the reference default) starts from new arrivals only.
    *
    * LATEST is implemented by snapshotting the newest modification time
    * among files already in `dir` at stream construction and admitting
    * only files written strictly after it, via the file source's
    * `_metadata.file_modification_time` — the file source itself has no
    * starting-position knob, and its `latestFirst` option merely REORDERS
    * processing (the backlog would still be ingested, newest first, which
    * additionally breaks arrival-order assumptions for sequence-number
    * dedup). Files are admitted in normal oldest-first order on both
    * paths. Granularity caveat: a delivery landing within the same
    * filesystem-timestamp tick as the newest backlog file counts as
    * backlog — the analog of attaching to a shard between two records
    * with the same arrival timestamp.
    */
  def stream(spark: SparkSession, dir: String, schema: StructType,
      mapping: EventSourceMapping = EventSourceMapping()): DataFrame = {
    val base = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", math.max(1, mapping.batchSize / 1000).toString)
      .json(dir)
    if (mapping.startingPosition == "LATEST")
      base.where(col("_metadata.file_modification_time") >
        lit(new Timestamp(backlogCutoffMillis(dir))))
    else base
  }

  /** Newest `lastModified` among files already in `dir`; 0 (epoch — admit
    * everything) when the dir is absent or empty. Driver-side, one
    * listing at construction: O(backlog files) once, no per-batch cost.
    */
  private def backlogCutoffMillis(dir: String): Long =
    Option(new java.io.File(dir).listFiles())
      .map(_.iterator.filter(_.isFile).map(_.lastModified).foldLeft(0L)(math.max))
      .getOrElse(0L)

  /** The mapping's gather policy as a Spark trigger: a per-delivery
    * tumbling window fires on that cadence; otherwise the max batching
    * window caps how long the source gathers before invoking.
    */
  def trigger(mapping: EventSourceMapping): Trigger =
    Trigger.ProcessingTime(
      mapping.tumblingWindowSec.getOrElse(mapping.maxBatchingWindowSec) * 1000L)
}
