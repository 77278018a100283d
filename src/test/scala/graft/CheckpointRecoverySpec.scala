package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.sources.Nexmark
import graft.sources.Nexmark.Bid
import graft.streaming.StreamOps

/** Checkpoint-based recovery — the reference's state backends persist
  * window state across function invocations (state/mod.rs); Spark's
  * analog is restarting a query from its checkpoint. The restarted query
  * must deliver exactly-once file output: no loss, no duplication.
  */
class CheckpointRecoverySpec extends SparkSpec {

  test("parquet sink resumes from checkpoint without loss or duplication") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bids = (0L until 4000L).filter(Nexmark.kindOf(_) == 2)
      .map(Nexmark.genBid(_, 1000))
    val tmp = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val in = MemoryStream[Bid]

    val q1 = StreamOps.toParquet(StreamOps.elementwise(in.toDF()),
      s"$tmp/out", s"$tmp/ckpt", Trigger.AvailableNow())
    in.addData(bids.take(2000))
    q1.awaitTermination(60000)

    // "crash" (query finished AvailableNow) → restart from the same
    // checkpoint with more data queued
    in.addData(bids.drop(2000))
    val q2 = StreamOps.toParquet(StreamOps.elementwise(in.toDF()),
      s"$tmp/out", s"$tmp/ckpt", Trigger.AvailableNow())
    q2.awaitTermination(60000)

    val out = spark.read.parquet(s"$tmp/out")
    assert(out.count() == bids.size,
      s"exactly-once violated: ${out.count()} != ${bids.size}")
    assert(out.select("auction", "bidder", "b_date_time").distinct().count() ==
      bids.map(b => (b.auction, b.bidder, b.b_date_time)).distinct.size)
  }

  test("multi-stateful ingest pipeline recovers dedup + window state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamOps.DocEvent
    val t0 = 1_436_918_400_000L
    def doc(id: Long, sec: Int, text: String) =
      DocEvent(id, new java.sql.Timestamp(t0 + sec * 1000L), text)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ckpt2").toString
    val in = MemoryStream[DocEvent]
    def start() = StreamOps.toParquet(
      StreamOps.ingestPipelineStream(in.toDS(), "1 second", "10 seconds"),
      s"$tmp/out", s"$tmp/ckpt", Trigger.AvailableNow())

    in.addData(Seq(
      doc(1, 0, "the cat and the dog of a house is big"),
      doc(2, 1, "der hund und die katze ist ein tier")))
    val q1 = start(); q1.awaitTermination(60000)

    // restart: the duplicate of doc 1 must still be recognized from the
    // RECOVERED dedup state, and the first window must close and emit
    // once the watermark (restored, then advanced by the flush doc)
    // passes its end
    in.addData(Seq(
      doc(3, 2, "the cat and the dog of a house is big"), // dup across restart
      doc(4, 3, "el perro y la casa es un lugar grande"),
      doc(99, 100, "flush flush flush flush")))
    val q2 = start(); q2.awaitTermination(60000)

    val out = spark.read.parquet(s"$tmp/out")
      .select($"predicted", $"n_docs", $"sum_tokens")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("en", 1L, 10L), ("de", 1L, 8L), ("es", 1L, 9L)),
      out.toString)
  }

  test("heavy-hitter MG state recovers across restart and emits each window once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamOps.DocEvent
    val t0 = 1_436_918_400_000L
    def doc(id: Long, sec: Int, text: String) =
      DocEvent(id, new java.sql.Timestamp(t0 + sec * 1000L), text)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ckpt3").toString
    val in = MemoryStream[DocEvent]
    def start() = StreamOps.toParquet(
      StreamOps.heavyHittersStream(in.toDS(), 10, 4, "0 seconds").toDF(),
      s"$tmp/out", s"$tmp/ckpt", Trigger.AvailableNow())

    // window [t0, t0+10s): counts split across the restart — the second
    // half must accumulate INTO the recovered MG summary
    in.addData(Seq(
      doc(1, 0, "alpha alpha alpha beta gamma"),
      doc(2, 3, "alpha beta delta")))
    val q1 = start(); q1.awaitTermination(60000)
    in.addData(Seq(
      doc(3, 8, "alpha alpha beta epsilon"),
      doc(4, 3600, "closer"))) // advances watermark, closes the window
    val q2 = start(); q2.awaitTermination(60000)

    val out = spark.read.parquet(s"$tmp/out")
      .select($"w_start", $"tok", $"est", $"n_tokens")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1),
        r.getLong(2), r.getLong(3)))
    // exactly one closed window, reported once
    assert(out.map(_._1).distinct.toSeq == Seq(t0), out.mkString(","))
    val exact = Map("alpha" -> 6L, "beta" -> 3L, "gamma" -> 1L,
      "delta" -> 1L, "epsilon" -> 1L)
    val n = exact.values.sum
    assert(out.forall(_._4 == n), s"n_tokens drifted: ${out.mkString(",")}")
    val err = n / 5 // k=4
    out.foreach { case (_, t, est, _) =>
      assert(est <= exact(t) && exact(t) - est <= err,
        s"$t est=$est exact=${exact(t)}")
    }
    // 'alpha' dominates (6 > 12/5) and must survive recovery
    assert(out.exists(_._2 == "alpha"), out.mkString(","))
  }
}
