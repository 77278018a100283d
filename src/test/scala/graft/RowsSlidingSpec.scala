package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps

/** Rows-schedule sliding window (reference Window::Sliding +
  * Schedule::Rows): the batch q130 form against a brute-force replay,
  * and the streaming form against the batch form.
  */
class RowsSlidingSpec extends SparkSpec {

  private def cents(v: Double): Long = math.floor(v * 100 + 0.5001).toLong

  private def bruteForce(size: Int, slide: Int): Seq[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    Tables(spark, sfDir, "events")
      .select($"user_id", $"event_id", $"value")
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).toSeq
      .flatMap { case (user, evs) =>
        val ordered = evs.sortBy(_._2).map(e => cents(e._3))
        ordered.indices.collect {
          case i if (i + 1) % slide == 0 =>
            val frame = ordered.slice(math.max(0, i - size + 1), i + 1)
            (user, (i + 1).toLong, frame.length.toLong, frame.sum,
              frame.sum / frame.length)
        }
      }
  }

  test("batch q130 matches the brute-force trailing-frame replay") {
    import spark.implicits._
    val got = operators.Windows.defs("q130_rows_sliding")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val expected = bruteForce(50, 10).toSet
    assert(expected.nonEmpty, "test data must produce emissions")
    assert(got == expected)
  }

  test("streaming rows window reproduces batch q130 across monotone batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables(spark, sfDir, "events")
      .select($"user_id", $"event_id", $"value")
      .as[(Long, Long, Double)].collect()
      .sortBy(_._2)
      .map { case (u, id, v) => StreamOps.RowsEvent(u, id, cents(v)) }
    val in = MemoryStream[StreamOps.RowsEvent]
    val out = StreamOps.rowsSlidingStream(in.toDS(), size = 50, slide = 10)
    val q = StreamOps.toMemory(out.toDF(), "rows_sliding_test", OutputMode.Append)
    try {
      // several monotone micro-batches — arrival order == event_id order
      ev.grouped(math.max(1, ev.length / 5)).foreach { chunk =>
        in.addData(chunk.toSeq); q.processAllAvailable()
      }
      val got = spark.table("rows_sliding_test")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val batch = operators.Windows.defs("q130_rows_sliding")(spark, sfDir)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("emission count is invariant to micro-batch slicing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = (1L to 95L).map(i => StreamOps.RowsEvent(1L, i, i * 10))
    def run(chunks: Int): Set[(Long, Long, Long, Long, Long)] = {
      val in = MemoryStream[StreamOps.RowsEvent]
      val out = StreamOps.rowsSlidingStream(in.toDS(), size = 20, slide = 7)
      val name = s"rows_inv_$chunks"
      val q = StreamOps.toMemory(out.toDF(), name, OutputMode.Append)
      try {
        ev.grouped(math.max(1, ev.length / chunks)).foreach { c =>
          in.addData(c.toSeq); q.processAllAvailable()
        }
        spark.table(name).as[(Long, Long, Long, Long, Long)].collect().toSet
      } finally q.stop()
    }
    val one = run(1)
    assert(one.size == 95 / 7)
    // every emission's frame is the trailing ≤20 rows: seq 7 → rows 1..7,
    // seq 21 → rows 2..21 (sum of i*10 over the frame)
    def frameSum(seq: Long) = (math.max(1L, seq - 19) to seq).sum * 10
    one.foreach { case (_, seq, n, sum, avg) =>
      assert(n == math.min(seq, 20L))
      assert(sum == frameSum(seq))
      assert(avg == sum / n)
    }
    assert(run(4) == one)
    assert(run(10) == one)
  }
}
