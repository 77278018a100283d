package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.Nexmark
import graft.sources.Nexmark.Bid
import graft.streaming.StreamOps

/** KV-store sink pattern: foreachBatch upserts per-auction counts into a
  * shared map (the reference's DynamoDB sink analog, datasink/mod.rs).
  */
class ForeachBatchSpec extends SparkSpec {

  test("foreachBatch upserts micro-batch aggregates into a KV store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bids = (0L until 3000L).filter(Nexmark.kindOf(_) == 2)
      .map(Nexmark.genBid(_, 1000))
    val in = MemoryStream[Bid]
    val store = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val counts = in.toDF().groupBy($"auction").agg(count(lit(1)).as("n"))
    val q = StreamOps.toForeachBatch(counts) { (batch, _) =>
      batch.collect().foreach(r => store.put(r.getInt(0), r.getLong(1)))
    }
    try {
      in.addData(bids.take(1500))
      q.processAllAvailable()
      in.addData(bids.drop(1500))
      q.processAllAvailable()
    } finally q.stop()
    // store must equal the batch-side counts after the final upsert
    val expected = bids.groupBy(_.auction).view.mapValues(_.size.toLong).toMap
    import scala.jdk.CollectionConverters._
    assert(store.asScala.toMap == expected)
  }
}
