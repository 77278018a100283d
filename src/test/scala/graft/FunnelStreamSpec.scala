package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps

/** Streaming CEP funnel vs the batch q108 semi-join funnel: the batch
  * result is independently verified against a reachable-set DP
  * (RelationalSpec), so agreement here pins the streaming path to the
  * same existential-chain semantics end-to-end — buffering, event-time
  * timeout emission, and the close-time DP.
  */
class FunnelStreamSpec extends SparkSpec {

  test("streaming funnel depths aggregate to the batch q108 funnel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    val ev = Tables(spark, sfDir, "events")
      .select($"user_id", $"ts", $"event_type")
      .as[(Long, Timestamp, String)].collect()
    val maxTs = ev.map(_._2.getTime).max
    val day = 86_400_000L
    val in = MemoryStream[StreamOps.FunnelEvent]
    val out = StreamOps.funnelStream(in.toDS(), steps,
      gapMs = 3_600_000L, idleCloseMs = 3_600_000L, watermark = "0 seconds")
    val q = StreamOps.toMemory(out.toDF(), "funnel_test", OutputMode.Append)
    try {
      in.addData(ev.map { case (u, t, e) => StreamOps.FunnelEvent(u, t, e) })
      q.processAllAvailable()
      // two sentinel batches: the first advances the watermark past every
      // user's idle-close timestamp, the second lets the timeouts fire
      in.addData(Seq(StreamOps.FunnelEvent(-1, new Timestamp(maxTs + day), "view")))
      q.processAllAvailable()
      in.addData(Seq(StreamOps.FunnelEvent(-2, new Timestamp(maxTs + 2 * day), "view")))
      q.processAllAvailable()
      val got = spark.table("funnel_test").as[StreamOps.FunnelDepth]
        .collect().filter(_.user_id >= 0)
      // exactly one emission per user that had at least one step event
      val expectedUsers = ev.collect { case (u, _, e) if steps.contains(e) => u }.toSet
      assert(got.map(_.user_id).toSet == expectedUsers)
      assert(got.length == expectedUsers.size, "duplicate emissions")
      val batch = operators.Windows.defs("q108_funnel")(spark, sfDir)
        .as[(String, Long)].collect().toMap
      val depths = got.map(_.depth)
      assert(depths.count(_ >= 1).toLong == batch("1_view"))
      assert(depths.count(_ >= 2).toLong == batch("2_view_click"))
      assert(depths.count(_ >= 3).toLong == batch("3_view_click_purchase"))
    } finally q.stop()
  }

  test("funnel is arrival-order invariant within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    val ev = Tables(spark, sfDir, "events")
      .select($"user_id", $"ts", $"event_type")
      .as[(Long, Timestamp, String)].collect()
      .filter(e => steps.contains(e._3))
    val maxTs = ev.map(_._2.getTime).max
    val day = 86_400_000L
    // REVERSED event-time order across batches: every event after the
    // first batch is "late"; a 40-day watermark delay (> the 30-day data
    // span) must keep them all, and the close-time DP restores order
    val in = MemoryStream[StreamOps.FunnelEvent]
    val out = StreamOps.funnelStream(in.toDS(), steps,
      gapMs = 3_600_000L, idleCloseMs = 3_600_000L, watermark = "40 days")
    val q = StreamOps.toMemory(out.toDF(), "funnel_ooo", OutputMode.Append)
    try {
      val reversed = ev.sortBy(-_._2.getTime)
        .map { case (u, t, e) => StreamOps.FunnelEvent(u, t, e) }
      reversed.grouped(math.max(1, reversed.length / 3)).foreach { chunk =>
        in.addData(chunk.toSeq); q.processAllAvailable()
      }
      // sentinels: watermark = max - 40d, so push 42d past every timeout
      in.addData(Seq(StreamOps.FunnelEvent(-1,
        new Timestamp(maxTs + 42 * day), "view")))
      q.processAllAvailable()
      in.addData(Seq(StreamOps.FunnelEvent(-2,
        new Timestamp(maxTs + 84 * day), "view")))
      q.processAllAvailable()
      val got = spark.table("funnel_ooo").as[StreamOps.FunnelDepth]
        .collect().filter(_.user_id >= 0)
      val batch = operators.Windows.defs("q108_funnel")(spark, sfDir)
        .as[(String, Long)].collect().toMap
      val depths = got.map(_.depth)
      assert(got.length == ev.map(_._1).distinct.length, "one emission per user")
      assert(depths.count(_ >= 1).toLong == batch("1_view"))
      assert(depths.count(_ >= 2).toLong == batch("2_view_click"))
      assert(depths.count(_ >= 3).toLong == batch("3_view_click_purchase"))
    } finally q.stop()
  }

  test("funnel DP requires all reachable ends, not the greedy earliest") {
    // view@0 opens a window that closes before the click; only the later
    // view@50 chains — earliest-end greedy would return depth 1
    val times = Array(0L, 50_000L, 70_000L)
    val steps = Array(0, 0, 1)
    assert(StreamOps.funnelDepthOf(times, steps, 3, gapMs = 60_000L) == 2)
    // and the chain must be strictly increasing: a click at the same
    // instant as the view does not count
    assert(StreamOps.funnelDepthOf(Array(10L, 10L), Array(0, 1), 3, 60_000L) == 1)
    // out-of-order buffers are handled (DP is order-independent)
    assert(StreamOps.funnelDepthOf(Array(70_000L, 0L, 50_000L), Array(1, 0, 0),
      3, 60_000L) == 2)
  }
}
