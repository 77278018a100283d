package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.sources.Nexmark
import graft.sources.Nexmark.{Auction, Bid}
import graft.streaming.StreamOps

class StreamJoinSpec extends SparkSpec {

  test("stream-stream winning-bid join equals the batch range join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val n = 5000L
    val auctions = (0L until n).filter(Nexmark.kindOf(_) == 1).map(Nexmark.genAuction(_, 1000))
    val bids = (0L until n).filter(Nexmark.kindOf(_) == 2).map(Nexmark.genBid(_, 1000))
    val inA = MemoryStream[Auction]
    val inB = MemoryStream[Bid]
    val joined = StreamOps.winningBidJoin(
        inA.toDF(), inB.toDF(), "0 seconds", "1 hour")
      .select($"a_id", $"auction", $"price", $"b_date_time")
    val q = StreamOps.toMemory(joined, "ssjoin_test", OutputMode.Append)
    try {
      // interleave arrivals across micro-batches
      inA.addData(auctions.take(auctions.size / 2))
      inB.addData(bids.take(bids.size / 2))
      q.processAllAvailable()
      inA.addData(auctions.drop(auctions.size / 2))
      inB.addData(bids.drop(bids.size / 2))
      q.processAllAvailable()
      val streamed = spark.table("ssjoin_test").collect().toSet
      val batch = auctions.toDF().join(bids.toDF(),
          expr("""a_id = auction AND b_date_time >= a_date_time
                  AND b_date_time <= a_date_time + INTERVAL 1 HOUR
                  AND b_date_time <= expires"""))
        .select($"a_id", $"auction", $"price", $"b_date_time")
        .collect().toSet
      assert(streamed == batch,
        s"stream=${streamed.size} batch=${batch.size} " +
          s"only-stream=${(streamed -- batch).take(2)} only-batch=${(batch -- streamed).take(2)}")
    } finally q.stop()
  }

  test("left-outer stream-stream join emits null-extended rows after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(1_436_918_400_000L + sec * 1000L)
    val inL = MemoryStream[Bid]
    val inR = MemoryStream[StreamOps.RateUpdate]
    val lw = inL.toDF().withWatermark("b_date_time", "0 seconds")
    val rw = inR.toDF().withWatermark("rtime", "0 seconds")
    // outer stream-stream joins need watermarks on both sides plus a
    // time-range condition so unmatched state can be evicted and emitted
    val joined = lw.join(rw,
      expr("""auction = rkey AND rtime >= b_date_time - INTERVAL 5 SECONDS
              AND rtime <= b_date_time"""),
      "left_outer")
      .select($"auction", $"b_date_time", $"rate")
    val q = StreamOps.toMemory(joined, "louter_test", OutputMode.Append)
    try {
      inL.addData(Seq(
        Bid(1, 10, 100, ts(10)),  // matched by rate at ts(8)
        Bid(2, 11, 200, ts(10)),  // no rate for key 2 -> null-extended
        Bid(3, 12, 300, ts(11)))) // rate exists but outside the 5 s range
      inR.addData(Seq(
        StreamOps.RateUpdate(1, ts(8), 0.5),
        StreamOps.RateUpdate(3, ts(2), 0.9)))
      q.processAllAvailable()
      // sentinels push both watermarks far past the join windows; the
      // extra batch lets the new watermark evict + emit unmatched rows
      inL.addData(Seq(Bid(99, 0, 1, ts(100))))
      inR.addData(Seq(StreamOps.RateUpdate(99, ts(100), 1.0)))
      q.processAllAvailable()
      inL.addData(Seq(Bid(98, 0, 1, ts(101))))
      q.processAllAvailable()
      val rows = spark.table("louter_test").collect()
        .map(r => (r.getInt(0), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .toSet
      assert(rows.contains((1, Some(0.5))), s"matched row missing: $rows")
      assert(rows.contains((2, None)), s"null-extended row for key 2 missing: $rows")
      assert(rows.contains((3, None)), s"out-of-range key 3 must be null-extended: $rows")
    } finally q.stop()
  }

  test("session windows run on the RocksDB state store provider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val bids = (0L until 3000L).filter(Nexmark.kindOf(_) == 2).map(Nexmark.genBid(_, 1000))
      val in = MemoryStream[Bid]
      val q = StreamOps.toMemory(
        StreamOps.tumblingCounts(in.toDF(), "10 seconds", "0 seconds"),
        "rocksdb_test", OutputMode.Complete)
      try {
        in.addData(bids)
        q.processAllAvailable()
        val total = spark.table("rocksdb_test").agg(sum($"num")).head.getLong(0)
        assert(total == bids.size, s"RocksDB-backed agg lost rows: $total")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream-static side-input join equals batch q13") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bids = (0L until 3000L).filter(Nexmark.kindOf(_) == 2).map(Nexmark.genBid(_, 1000))
    val side = Nexmark.sideInput(spark)
    val in = MemoryStream[Bid]
    val q = StreamOps.toMemory(
      StreamOps.sideInputJoinStream(in.toDF(), side),
      "sideinput_test", OutputMode.Append)
    try {
      in.addData(bids.take(1500)); q.processAllAvailable()
      in.addData(bids.drop(1500)); q.processAllAvailable()
      val streamed = spark.table("sideinput_test").collect().toSet
      val batch = bids.toDF().join(broadcast(side),
          pmod($"auction", lit(10000)) === $"key")
        .select($"auction", $"bidder", $"price", $"b_date_time", $"value")
        .collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
