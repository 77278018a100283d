package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{Credit, TouchEvent}

/** attributionStream: event-ordered delivery of the sf0.001 events table
  * must reproduce batch q141's per-channel rollup exactly, for any
  * micro-batch split of the delivery.
  */
class AttributionStreamSpec extends SparkSpec {

  private lazy val events: Seq[TouchEvent] = {
    import spark.implicits._
    Tables(spark, sfDir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type", $"value",
        coalesce(get_json_object($"props", "$.k").cast("long"), lit(-1L))
          .as("k"))
      .as[TouchEvent].collect().toSeq
      .sortBy(e => (e.ts.getTime, e.event_id)) // event-ordered transport
  }

  private lazy val batchRollup: Map[Long, (Long, Long)] = {
    import spark.implicits._
    operators.Windows.defs("q141_lasttouch_attribution")(spark, sfDir)
      .as[(Long, Long, Long)].collect()
      .map { case (ch, n, cents) => (ch, (n, cents)) }.toMap
  }

  private def runStream(batches: Seq[Seq[TouchEvent]],
      name: String): Map[Long, (Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TouchEvent]
    val q = StreamOps.toMemory(
      StreamOps.attributionStream(in.toDS()).toDF(), name, OutputMode.Append)
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).as[Credit].collect()
        .groupBy(_.channel).map { case (ch, cs) =>
          (ch, (cs.length.toLong, cs.map(_.cents).sum))
        }
    } finally q.stop()
  }

  test("streamed credits equal batch q141 (single batch)") {
    assert(runStream(Seq(events), "attr_one") == batchRollup)
  }

  test("credits are invariant to micro-batch boundaries") {
    val n = events.length
    val split = Seq(events.take(n / 3), events.slice(n / 3, 2 * n / 3),
      events.drop(2 * n / 3))
    assert(runStream(split, "attr_three") == batchRollup)
  }
}
