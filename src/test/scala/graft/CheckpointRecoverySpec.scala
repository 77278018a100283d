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
}
