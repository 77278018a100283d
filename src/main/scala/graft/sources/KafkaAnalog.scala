package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, Trigger}
import org.apache.spark.sql.types.StructType

/** Kafka-analog source — the reference's Kafka ingest surface re-expressed
  * Spark-first, closing SURVEY §2.1's last source row at the same depth as
  * [[KinesisAnalog]].
  *
  * The reference (flock/src/datasource/kafka.rs:48-143) has two executable
  * pieces and one stub: `to_batch` (kafka.rs:93-143) base64-decodes each
  * consumed record's value, newline-joins them and JSON-parses the bytes
  * into Arrow batches; `create_event_source_mapping_request`
  * (kafka.rs:54-91) declares the consumer contract (batch size 10000, max
  * batching window 300 s, parallelization factor 4, starting position
  * LATEST, optional per-delivery tumbling window, topic list); and
  * `KafkaSource::fetch_data` is `unimplemented!()` — the reference never
  * talks to a broker either. Both real pieces map onto Spark directly:
  *
  *  - the bytes→rows mapping is `from_json` against a DECLARED schema over
  *    the record shape Spark's own Kafka connector emits
  *    (`key, value: binary, topic, partition, offset, timestamp`) — any
  *    transport that hands that shape (the connector, a MemoryStream, a
  *    replayed capture) decodes identically;
  *  - the consumer contract maps onto connector reader options plus a
  *    processing-time trigger.
  *
  * The reference INFERS the JSON schema from the first record of each
  * delivery (kafka.rs:100-105) — per-delivery inference drifts types
  * across deliveries and costs an extra parse pass; we require the schema
  * declared once, like every other source here (SURVEY §1.3).
  */
object KafkaAnalog {

  /** One consumed record — the column shape Spark's Kafka connector emits
    * (and the payload of kafka.rs's `KafkaEvent` records, post-base64).
    */
  case class Record(topic: String, partition: Int, offset: Long,
      timestamp: Timestamp, key: String, value: Array[Byte])

  /** Consumer-contract analog of kafka.rs:54-91's event-source-mapping
    * request. Defaults mirror the reference's literal values.
    */
  case class ConsumerContract(
      topics: Seq[String],
      batchSize: Int = 10000,
      maxBatchingWindowSec: Int = 300,
      parallelizationFactor: Int = 4,
      startingPosition: String = "LATEST",
      tumblingWindowSec: Option[Int] = None)

  /** Batch form of kafka.rs:93-143 `to_batch`: one consumed delivery's
    * records → rows. Payloads parse as JSON against the declared schema;
    * the transport metadata (topic, partition, offset, timestamp, key)
    * stays attached so downstream operators can dedup on (topic,
    * partition, offset) or window on the broker timestamp. Corrupt
    * payloads surface as null decoded fields (PERMISSIVE) instead of
    * failing the delivery — the reference's `.unwrap()` fail-fast is a
    * `row IS NULL`-filter-and-throw away for callers that want it.
    */
  def toBatch(spark: SparkSession, records: Seq[Record],
      schema: StructType): DataFrame = {
    import spark.implicits._
    decodeRecords(records.toDF(), schema)
  }

  /** Row-level decode shared by the batch and streaming paths: cast the
    * connector's binary `value` to string and parse against the schema,
    * flattening payload fields next to the transport metadata. Pure
    * projection — codegen'd, no shuffle, safe at any scale.
    */
  def decodeRecords(df: DataFrame, schema: StructType): DataFrame =
    KinesisAnalog.decodePayloads(
      df.withColumn("payload", col("value").cast("string")).drop("value"),
      schema)

  /** The consumer contract as connector reader options — the testable
    * half of [[reader]] (a `DataStreamReader` does not expose its options
    * back). Mapping: batch size bounds records-per-trigger; LATEST/
    * TRIM_HORIZON become the connector's starting offsets; the
    * parallelization factor becomes `minPartitions` (the connector's
    * knob for splitting topic-partitions across more than one task —
    * the same per-shard concurrency the reference's factor buys).
    */
  def readerOptions(brokers: String,
      contract: ConsumerContract): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> brokers,
    "subscribe" -> contract.topics.mkString(","),
    "startingOffsets" ->
      (if (contract.startingPosition == "LATEST") "latest" else "earliest"),
    "maxOffsetsPerTrigger" -> contract.batchSize.toString,
    "minPartitions" ->
      (contract.topics.size * contract.parallelizationFactor).toString)

  /** Fully configured connector reader (not started — no broker in this
    * container, and the reference's own `fetch_data` is
    * `unimplemented!()`). `decodeRecords(reader.load(), schema)` is the
    * complete wiring once a broker exists.
    */
  def reader(spark: SparkSession, brokers: String,
      contract: ConsumerContract): DataStreamReader =
    readerOptions(brokers, contract).foldLeft(
      spark.readStream.format("kafka")) { case (r, (k, v)) => r.option(k, v) }

  /** The contract's gather policy as a Spark trigger — identical rule to
    * [[KinesisAnalog.trigger]] (both reference mappings share the
    * batching-window/tumbling-window fields).
    */
  def trigger(contract: ConsumerContract): Trigger =
    Trigger.ProcessingTime(
      contract.tumblingWindowSec.getOrElse(contract.maxBatchingWindowSec) * 1000L)
}
