package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import graft.sources.Nexmark
import graft.sources.Nexmark.Bid
import graft.streaming.StreamOps

/** Streaming q5 (hot items) must report the same per-window winners as the
  * batch q5 once the watermark has closed every window.
  */
class HotItemsStreamSpec extends SparkSpec {

  test("streaming hot items equals batch q5 winners for closed windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bids = (0L until 5000L).filter(Nexmark.kindOf(_) == 2).map(Nexmark.genBid(_, 1000))
    val maxTs = bids.map(_.b_date_time.getTime).max
    val sentinel = Bid(-1, -1, 1, new Timestamp(maxTs + 3600L * 1000))
    val in = MemoryStream[Bid]
    val winners = scala.collection.mutable.Set[(Timestamp, Int, Long)]()
    val q = StreamOps.hotItemsStream(in.toDF(), "0 seconds") { df =>
      winners.synchronized {
        df.collect().foreach(r =>
          winners += ((r.getTimestamp(0), r.getInt(1), r.getLong(2))))
      }
    }
    try {
      in.addData(bids.take(2500)); q.processAllAvailable()
      in.addData(bids.drop(2500)); q.processAllAvailable()
      in.addData(Seq(sentinel)); q.processAllAvailable()   // close all real windows
      in.addData(Seq(sentinel.copy(b_date_time = new Timestamp(maxTs + 7200L * 1000))))
      q.processAllAvailable()
    } finally q.stop()
    // batch q5 semantics on the same data (max count per hopping window,
    // ALL tied winners — streaming side uses rank() so ties also emit)
    val batch = bids.toDF()
      .groupBy(org.apache.spark.sql.functions.window($"b_date_time", "10 seconds", "5 seconds").as("w"), $"auction")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("num"))
    val mx = batch.groupBy($"w").agg(org.apache.spark.sql.functions.max($"num").as("maxn"))
    val expected = batch.join(mx, Seq("w")).filter($"num" === $"maxn")
      .select($"w.start", $"auction", $"num")
      .collect().map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2))).toSet
    val got = winners.toSet.filterNot(_._2 == -1)
    assert(got == expected,
      s"only-stream=${(got -- expected).take(3)} only-batch=${(expected -- got).take(3)}")
  }
}
