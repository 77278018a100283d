package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import graft.sources.KafkaAnalog
import graft.streaming.StreamOps

/** Kafka-analog ingest (reference kafka.rs:48-143): record value bytes →
  * rows against a declared schema, batch and embedded streaming
  * transports, consumer-contract → reader-option/trigger mapping.
  */
class KafkaAnalogSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("amount", DoubleType)))

  private def rec(p: Int, off: Long, u: Long, e: String, a: Double) =
    KafkaAnalog.Record("events", p, off,
      new Timestamp(1_767_225_600_000L + off * 1000L), s"k$u",
      s"""{"user_id":$u,"event_type":"$e","amount":$a}""".getBytes(UTF_8))

  test("toBatch parses one delivery's record values against the declared schema") {
    import spark.implicits._
    val records = (1 to 40).map(i =>
      rec(i % 3, i.toLong, i.toLong, if (i % 2 == 0) "view" else "click", i * 1.5))
    val df = KafkaAnalog.toBatch(spark, records, schema)
    assert(df.columns.toSeq == Seq("topic", "partition", "offset",
      "timestamp", "key", "user_id", "event_type", "amount"))
    val got = df.select($"offset", $"user_id", $"event_type", $"amount")
      .as[(Long, Long, String, Double)].collect().sortBy(_._1)
    assert(got.length == 40)
    assert(got.head == ((1L, 1L, "click", 1.5)))
    assert(got.last == ((40L, 40L, "view", 60.0)))
    // transport metadata survives for (topic, partition, offset) dedup
    assert(df.select($"partition").distinct().count() == 3)
  }

  test("corrupt record values null out instead of failing the delivery") {
    import spark.implicits._
    val records = Seq(rec(0, 1L, 7L, "view", 1.0),
      KafkaAnalog.Record("events", 0, 2L,
        new Timestamp(1_767_225_600_000L), "k", "NOT JSON{{".getBytes(UTF_8)))
    val rows = KafkaAnalog.toBatch(spark, records, schema)
      .select($"offset", $"user_id").as[(Long, Option[Long])].collect().toMap
    assert(rows(1L).contains(7L))
    assert(rows(2L).isEmpty, "corrupt value must surface as nulls")
  }

  test("embedded streaming transport decodes micro-batches, batching-invariant") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[KafkaAnalog.Record]
    val q = StreamOps.toMemory(
      KafkaAnalog.decodeRecords(in.toDF(), schema), "kafka_test",
      OutputMode.Append)
    try {
      in.addData((1 to 10).map(i => rec(i % 2, i.toLong, i.toLong, "view", i * 1.0)))
      q.processAllAvailable()
      in.addData((11 to 15).map(i => rec(i % 2, i.toLong, i.toLong, "click", i * 1.0)))
      q.processAllAvailable()
      val got = spark.table("kafka_test")
        .select($"user_id", $"event_type").as[(Long, String)].collect()
      assert(got.length == 15)
      assert(got.filter(_._2 == "click").map(_._1).sorted.toSeq == (11L to 15L))
    } finally q.stop()
  }

  test("consumer contract maps onto reader options and trigger cadence") {
    val c = KafkaAnalog.ConsumerContract(topics = Seq("a", "b"))
    val opts = KafkaAnalog.readerOptions("broker:9092", c)
    assert(opts("subscribe") == "a,b")
    assert(opts("startingOffsets") == "latest") // reference default LATEST
    assert(opts("maxOffsetsPerTrigger") == "10000") // kafka.rs:63 batch size
    assert(opts("minPartitions") == "8") // 2 topics × parallelization 4
    assert(KafkaAnalog.readerOptions("b",
      c.copy(startingPosition = "TRIM_HORIZON"))("startingOffsets") == "earliest")
    assert(KafkaAnalog.trigger(c)
      == org.apache.spark.sql.streaming.Trigger.ProcessingTime(300000L))
    assert(KafkaAnalog.trigger(c.copy(tumblingWindowSec = Some(10)))
      == org.apache.spark.sql.streaming.Trigger.ProcessingTime(10000L))
    // the fully-wired reader constructs (connector class ships with Spark;
    // no broker needed until .load())
    KafkaAnalog.reader(spark, "broker:9092", c)
  }
}
