package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps

/** rowsSlidingStream under key skew: one hot key receives a large burst
  * inside a single micro-batch (the documented worst case for the
  * per-key-per-batch sort slice), delivered in SHUFFLED arrival order so
  * the in-operator event_id sort is load-bearing. The burst must process
  * to completion and every emission must equal the sequential replay —
  * and the post-burst state must still be the O(size) ring: a follow-up
  * batch continues the row counter exactly.
  */
class RowsSlidingSkewSpec extends SparkSpec {

  test("a single-key burst in one micro-batch processes and replays exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val n = 120000
    val rnd = new scala.util.Random(42)
    val burst = rnd.shuffle((1 to n).toVector)
      .map(i => StreamOps.RowsEvent(7L, i.toLong, (i % 997).toLong))
    val cold = (1 to 50).map(i => StreamOps.RowsEvent(8L, i.toLong, 5L))
    val in = MemoryStream[StreamOps.RowsEvent]
    val out = StreamOps.rowsSlidingStream(in.toDS(), size = 100, slide = 1000)
    val q = StreamOps.toMemory(out.toDF(), "rows_skew_test", OutputMode.Append)
    try {
      in.addData(burst ++ cold) // one micro-batch, hot key + bystander
      q.processAllAvailable()
      // bystander key emits nothing (50 rows < slide) and is unaffected
      val got = spark.table("rows_skew_test")
        .as[StreamOps.RowsWindowEmit].collect()
      assert(got.forall(_.user_id == 7L))
      assert(got.length == n / 1000)
      val bySeq = got.map(e => e.seq -> e).toMap
      (1000L to n.toLong by 1000L).foreach { seq =>
        val frame = ((seq - 99) to seq).map(_ % 997)
        val e = bySeq(seq)
        assert(e.n_in_window == 100L && e.sum_cents == frame.sum &&
          e.avg_cents == frame.sum / 100,
          s"seq $seq: got $e expected sum ${frame.sum}")
      }
      // state survived as the bounded ring: the next batch continues the
      // counter (rows n+1 .. n+1000 → one more emission at seq n+1000)
      in.addData((n + 1 to n + 1000).map(i =>
        StreamOps.RowsEvent(7L, i.toLong, (i % 997).toLong)))
      q.processAllAvailable()
      val cont = spark.table("rows_skew_test")
        .as[StreamOps.RowsWindowEmit].collect()
      assert(cont.length == n / 1000 + 1)
      assert(cont.map(_.seq).max == n.toLong + 1000L)
    } finally q.stop()
  }
}
