package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.DocEvent

/** Late-data accounting: rows older than the watermark are DROPPED by
  * stateful operators, and production monitoring reads that count from
  * StreamingQueryProgress (stateOperators.numRowsDroppedByWatermark).
  * This pins (a) that the drop actually happens — the late duplicate
  * does NOT resurrect state that was already evicted — and (b) that the
  * metric surface reports it, which is what an operator dashboards at
  * scale instead of diffing outputs.
  */
class LateDataSpec extends SparkSpec {

  test("late rows are dropped, deduped output unchanged, and metered") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = new Timestamp(1_436_918_400_000L + sec * 1000L)
    val in = MemoryStream[DocEvent]
    val out = StreamOps.dedupExactStream(in.toDS(), "5 seconds")
    val q = StreamOps.toMemory(out, "late_test", OutputMode.Append)
    try {
      in.addData(Seq(
        DocEvent(1, ts(0), "alpha beta"),
        DocEvent(2, ts(1), "gamma delta")))
      q.processAllAvailable()
      // advance the watermark far past ts(0..1)
      in.addData(Seq(DocEvent(3, ts(120), "epsilon zeta")))
      q.processAllAvailable()
      // a LATE duplicate of doc 1: older than watermark -> dropped, not
      // re-emitted, and it must not be counted as a fresh distinct doc
      in.addData(Seq(DocEvent(4, ts(0), "alpha beta")))
      q.processAllAvailable()
      val emitted = spark.table("late_test").collect().map(_.getLong(0)).toSet
      assert(emitted == Set(1L, 2L, 3L), s"unexpected emissions: $emitted")
      val dropped = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      assert(dropped >= 1, "watermark drop must be visible in progress metrics")
    } finally q.stop()
  }
}
