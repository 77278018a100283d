package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import graft.sources.KinesisAnalog
import graft.streaming.StreamOps

/** Kinesis-analog ingest (reference kinesis.rs:42-111): payload-bytes →
  * rows against a declared schema, batch and landing-dir streaming
  * transports, delivery-contract → trigger mapping.
  */
class KinesisAnalogSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("amount", DoubleType)))

  private def jsonPayload(u: Long, e: String, a: Double): Array[Byte] =
    s"""{"user_id":$u,"event_type":"$e","amount":$a}""".getBytes(UTF_8)

  test("toBatch parses one delivery's JSON payloads against the declared schema") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    val records = (1 to 50).map { i =>
      KinesisAnalog.Record(s"pk${i % 4}", f"seq$i%05d",
        new Timestamp(t0.getTime + i * 1000L),
        jsonPayload(i.toLong, if (i % 2 == 0) "view" else "click", i * 1.5))
    }
    val df = KinesisAnalog.toBatch(spark, records, schema)
    assert(df.columns.toSeq == Seq("partition_key", "sequence_number",
      "arrival_ts", "user_id", "event_type", "amount"))
    val got = df.select($"sequence_number", $"user_id", $"event_type", $"amount")
      .as[(String, Long, String, Double)].collect().sortBy(_._1)
    assert(got.length == 50)
    assert(got.head == ("seq00001", 1L, "click", 1.5))
    assert(got.last == ("seq00050", 50L, "view", 75.0))
    // transport metadata survives for sequence-number dedup downstream
    assert(df.select($"partition_key").distinct().count() == 4)
  }

  test("corrupt payloads null out instead of failing the delivery") {
    import spark.implicits._
    val t = Timestamp.valueOf("2026-01-01 00:00:00")
    val records = Seq(
      KinesisAnalog.Record("pk", "s1", t, jsonPayload(7, "view", 1.0)),
      KinesisAnalog.Record("pk", "s2", t, "NOT JSON{{".getBytes(UTF_8)))
    val df = KinesisAnalog.toBatch(spark, records, schema)
    val rows = df.select($"sequence_number", $"user_id")
      .as[(String, Option[Long])].collect().toMap
    assert(rows("s1").contains(7L))
    assert(rows("s2").isEmpty, "corrupt payload must surface as nulls")
  }

  test("decodeRecords handles the connector binary-data shape") {
    import spark.implicits._
    val df = Seq(
      ("pk0", "s1", jsonPayload(1, "view", 2.0)),
      ("pk1", "s2", jsonPayload(2, "click", 4.0)))
      .toDF("partitionKey", "sequenceNumber", "data")
    val got = KinesisAnalog.decodeRecords(df, schema)
      .select($"sequenceNumber", $"user_id", $"amount")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("s1", 1L, 2.0), ("s2", 2L, 4.0)))
  }

  test("landing-dir stream delivers files as micro-batches, TRIM_HORIZON replays") {
    import spark.implicits._
    val dir = Files.createTempDirectory("kinesis_landing").toString
    // two pre-existing "deliveries", byte layout of kinesis.rs to_batch:
    // newline-joined JSON payloads per file
    def drop(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes(UTF_8))
    drop("d1.json", (1 to 20).map(i => s"""{"user_id":$i,"event_type":"view","amount":$i.0}"""))
    drop("d2.json", (21 to 30).map(i => s"""{"user_id":$i,"event_type":"click","amount":$i.0}"""))
    val mapping = KinesisAnalog.EventSourceMapping(
      batchSize = 1000, startingPosition = "TRIM_HORIZON")
    val stream = KinesisAnalog.stream(spark, dir, schema, mapping)
    assert(stream.isStreaming)
    val q = StreamOps.toMemory(stream, "kinesis_test", OutputMode.Append)
    try {
      q.processAllAvailable()
      // a new delivery lands mid-stream → next micro-batch picks it up
      drop("d3.json", Seq("""{"user_id":99,"event_type":"view","amount":9.0}"""))
      q.processAllAvailable()
      val got = spark.table("kinesis_test").as[(Long, String, Double)].collect()
      assert(got.length == 31)
      assert(got.map(_._1).toSet == ((1L to 30L).toSet + 99L))
    } finally q.stop()
  }

  test("LATEST skips the pre-existing backlog and ingests only new arrivals") {
    import spark.implicits._
    val dir = Files.createTempDirectory("kinesis_latest").toString
    def drop(name: String, lines: Seq[String], mtime: Long): Unit = {
      val p = Files.write(Paths.get(dir, name),
        lines.mkString("\n").getBytes(UTF_8))
      // pin modification times so the backlog/new boundary is
      // deterministic regardless of filesystem timestamp granularity
      assert(p.toFile.setLastModified(mtime))
    }
    val t0 = System.currentTimeMillis() - 3600 * 1000L
    drop("backlog1.json",
      (1 to 20).map(i => s"""{"user_id":$i,"event_type":"view","amount":$i.0}"""), t0)
    drop("backlog2.json",
      (21 to 30).map(i => s"""{"user_id":$i,"event_type":"click","amount":$i.0}"""), t0 + 1000L)
    val stream = KinesisAnalog.stream(spark, dir, schema,
      KinesisAnalog.EventSourceMapping(startingPosition = "LATEST"))
    val q = StreamOps.toMemory(stream, "kinesis_latest_test", OutputMode.Append)
    try {
      q.processAllAvailable()
      assert(spark.table("kinesis_latest_test").count() == 0,
        "LATEST must not replay the backlog")
      drop("new1.json",
        Seq("""{"user_id":99,"event_type":"view","amount":9.0}"""),
        System.currentTimeMillis())
      q.processAllAvailable()
      val got = spark.table("kinesis_latest_test")
        .as[(Long, String, Double)].collect()
      assert(got.toSeq == Seq((99L, "view", 9.0)))
    } finally q.stop()
  }

  test("delivery contract maps onto the trigger cadence") {
    import org.apache.spark.sql.streaming.Trigger
    assert(KinesisAnalog.trigger(KinesisAnalog.EventSourceMapping())
      == Trigger.ProcessingTime(300000L))
    assert(KinesisAnalog.trigger(
        KinesisAnalog.EventSourceMapping(tumblingWindowSec = Some(5)))
      == Trigger.ProcessingTime(5000L))
  }
}
