package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp
import graft.sources.Nexmark
import graft.sources.Nexmark.Bid
import graft.streaming.StreamOps

/** Streaming vs batch equivalence: the same generated bids through the
  * streaming window operators (via MemoryStream micro-batches) must match
  * the batch formulation — the reference's local-launcher tests play the
  * same role (SURVEY §3.3).
  */
class StreamOpsSpec extends SparkSpec {

  private def mkBids(n: Long): Seq[Bid] =
    (0L until n).filter(Nexmark.kindOf(_) == 2).map(Nexmark.genBid(_, 1000))

  test("streaming tumbling counts equal batch window counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bids = mkBids(5000)
    val in = MemoryStream[Bid]
    val q = StreamOps.toMemory(
      StreamOps.tumblingCounts(in.toDF(), "10 seconds", "0 seconds"),
      "tumbling_test", OutputMode.Complete)
    try {
      // two micro-batches to exercise incremental state
      in.addData(bids.take(2000))
      q.processAllAvailable()
      in.addData(bids.drop(2000))
      q.processAllAvailable()
      val streamed = spark.table("tumbling_test")
        .select($"w_start", $"auction", $"num")
        .collect().toSet
      val batch = bids.toDF()
        .groupBy(window($"b_date_time", "10 seconds").as("w"), $"auction")
        .agg(count(lit(1)).as("num"))
        .select($"w.start".as("w_start"), $"auction", $"num")
        .collect().toSet
      assert(streamed == batch,
        s"stream-only=${(streamed -- batch).take(3)} batch-only=${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("streaming hopping counts equal batch hopping counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bids = mkBids(3000)
    val in = MemoryStream[Bid]
    val q = StreamOps.toMemory(
      StreamOps.hoppingCounts(in.toDF(), "10 seconds", "5 seconds", "0 seconds"),
      "hopping_test", OutputMode.Complete)
    try {
      in.addData(bids)
      q.processAllAvailable()
      val streamed = spark.table("hopping_test").collect().toSet
      val batch = bids.toDF()
        .groupBy(window($"b_date_time", "10 seconds", "5 seconds").as("w"), $"auction")
        .agg(count(lit(1)).as("num"))
        .select($"w.start".as("w_start"), $"auction", $"num")
        .collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("flock-exact sessions close on gap and match batch gaps-and-islands") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 10000L
    val bids = mkBids(5000)
    val maxTs = bids.map(_.b_date_time.getTime).max
    // sentinel far-future bid per bidder is unnecessary: one global future
    // event advances the watermark past every session's timeout.
    val sentinel = Bid(auction = 0, bidder = -1, price = 1,
      b_date_time = new Timestamp(maxTs + 10 * gapMs))
    val in = MemoryStream[Bid]
    val q = StreamOps.toMemory(
      StreamOps.flockSessions(in.toDS(), gapMs, "0 seconds").toDF(),
      "sessions_test", OutputMode.Append)
    try {
      in.addData(bids.take(2500))
      q.processAllAvailable()
      in.addData(bids.drop(2500))
      q.processAllAvailable()
      in.addData(Seq(sentinel))
      q.processAllAvailable()
      // one extra empty-ish batch lets event-time timeouts fire
      in.addData(Seq(sentinel.copy(b_date_time = new Timestamp(maxTs + 20 * gapMs))))
      q.processAllAvailable()
      val streamed = spark.table("sessions_test")
        .filter($"bidder" >= 0)
        .select($"bidder", $"s_start", $"bid_count")
        .collect().toSet
      val batch = bids.toDF()
        .groupBy(session_window($"b_date_time", "10 seconds").as("w"), $"bidder")
        .agg(count(lit(1)).as("bid_count"))
        .select($"bidder", $"w.start".as("s_start"), $"bid_count")
        .collect().toSet
      assert(streamed == batch,
        s"stream-only=${(streamed -- batch).take(3)} batch-only=${(batch -- streamed).take(3)}")
    } finally q.stop()
  }

  test("stagger windows: per-key phase, full coverage, stream equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val w = 10000L
    val bids = mkBids(5000)
    val batch = StreamOps.staggerCounts(bids.toDF(), w)
    // invariants: every window start carries its key's phase, and counts
    // conserve the input
    val rows = batch.select($"w_start", $"auction", $"num").collect()
    assert(rows.map(_.getLong(2)).sum == bids.size)
    rows.foreach { r =>
      val startMs = r.getTimestamp(0).getTime
      val phase = Math.floorMod(
        org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
          r.getInt(1), org.apache.spark.sql.types.IntegerType, 42L), w)
      assert(Math.floorMod(startMs, w) == phase,
        s"window start ${startMs} not phase-aligned for key ${r.getInt(1)}")
    }
    // streaming (complete mode) equals batch
    val in = MemoryStream[Bid]
    val q = StreamOps.toMemory(StreamOps.staggerCounts(in.toDF(), w),
      "stagger_test", OutputMode.Complete)
    try {
      in.addData(bids.take(2000)); q.processAllAvailable()
      in.addData(bids.drop(2000)); q.processAllAvailable()
      assert(spark.table("stagger_test").collect().toSet == rows.toSet)
    } finally q.stop()
  }

  test("streaming dedup keeps first occurrence per content hash and signature") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamOps.DocEvent
    def doc(id: Long, sec: Int, text: String) =
      DocEvent(id, new Timestamp(1_436_918_400_000L + sec * 1000L), text)
    val batch1 = Seq(
      doc(1, 0, "the quick brown fox"),
      doc(2, 1, "the quick brown fox"), // exact dup of 1
      doc(3, 2, "a wholly different document about ships"))
    val batch2 = Seq(
      doc(4, 3, "the quick brown fox"), // exact dup across micro-batches
      doc(5, 4, "yet another distinct text about rivers"))
    val in = MemoryStream[DocEvent]
    val q = StreamOps.toMemory(
      StreamOps.dedupExactStream(in.toDS(), "1 hour"),
      "dedup_exact_test", OutputMode.Append)
    try {
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
      val kept = spark.table("dedup_exact_test").select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L, 5L), s"kept=$kept")
    } finally q.stop()

    val in2 = MemoryStream[DocEvent]
    val q2 = StreamOps.toMemory(
      StreamOps.dedupSignatureStream(in2.toDS(), "1 hour"),
      "dedup_sig_test", OutputMode.Append)
    try {
      in2.addData(batch1); q2.processAllAvailable()
      in2.addData(batch2); q2.processAllAvailable()
      val kept = spark.table("dedup_sig_test").select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L, 5L), s"kept=$kept")
    } finally q2.stop()

    // stream-vs-static-index dedup: docs whose signature is already in
    // the precomputed index are dropped, stateless (no watermark needed)
    val idxTexts = batch1.filter(_.doc_id == 1L).map(_.text)
    val indexSigs = idxTexts.toDF("text")
      .select(graft.functions.TextHashes
        .md5MinhashSig(split($"text", "\\s+"), 16).as("sig"))
    val in3 = MemoryStream[DocEvent]
    val q3 = StreamOps.toMemory(
      StreamOps.dedupAgainstIndexStream(in3.toDS(), indexSigs),
      "dedup_idx_test", OutputMode.Append)
    try {
      in3.addData(batch1); q3.processAllAvailable()
      in3.addData(batch2); q3.processAllAvailable()
      val kept = spark.table("dedup_idx_test").select($"doc_id")
        .collect().map(_.getLong(0)).toSet
      // docs 1/2/4 collide with the indexed signature and are dropped in
      // every micro-batch; 3 and 5 are novel vs the index and survive
      assert(kept == Set(3L, 5L), s"kept=$kept")
    } finally q3.stop()
  }

  test("streaming ingest pipeline: dedup -> quality -> langid -> windowed stats") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamOps.DocEvent
    val t0 = 1_436_918_400_000L
    def doc(id: Long, sec: Int, text: String) =
      DocEvent(id, new Timestamp(t0 + sec * 1000L), text)
    val batch = Seq(
      doc(1, 0, "the cat and the dog of a house is big"),
      doc(2, 1, "the cat and the dog of a house is big"), // exact dup -> dropped
      doc(3, 2, "der hund und die katze ist ein tier"),
      doc(4, 3, "el perro y la casa es un lugar grande"),
      doc(5, 4, "xq zz"), // below min tokens -> dropped
      doc(6, 5, "le chien et la maison est un lieu"))
    val in = MemoryStream[DocEvent]
    val q = StreamOps.toMemory(
      StreamOps.ingestPipelineStream(in.toDS(), "1 second", "10 seconds"),
      "ingest_pipeline_test", OutputMode.Append)
    try {
      in.addData(batch); q.processAllAvailable()
      // flush: advance the watermark far past the first window
      in.addData(Seq(doc(99, 100, "flush flush flush flush"))); q.processAllAvailable()
      val rows = spark.table("ingest_pipeline_test")
        .select($"predicted", $"n_docs", $"sum_tokens")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // doc1 (en, 10 toks), doc3 (de, 8), doc4 (es, 9), doc6 (fr, 8);
      // dup doc2 and short doc5 dropped before the aggregate
      assert(rows == Set(("en", 1L, 10L), ("de", 1L, 8L),
        ("es", 1L, 9L), ("fr", 1L, 8L)), rows.toString)
    } finally q.stop()
  }

  test("streaming as-of join equals the native batch as-of operator") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamOps.{PricedBid, RateUpdate}
    val t0 = 1_436_918_400_000L
    val bids = mkBids(3000) // event times span [t0, t0+3s)
    // rate updates per key every 500 ms inside the bid horizon, offset per
    // key; key 0 updates at exact bid timestamps (tie coverage)
    val rates = for (k <- 0 until 10; s <- 0 until 6)
      yield RateUpdate(k, new Timestamp(t0 + s * 500L + k * 30L),
        1.0 + k + s / 100.0)
    val in = MemoryStream[Bid]
    val rin = MemoryStream[RateUpdate]
    val q = StreamOps.toMemory(
      StreamOps.asofStream(in.toDS(), rin.toDS()).toDF(),
      "asof_stream_test", OutputMode.Append)
    // the operator's contract is per-key event-time order across batches
    // (merged over both inputs) — split both streams at the same cut time
    val cut = t0 + 1500L
    try {
      rin.addData(rates.filter(_.rtime.getTime < cut))
      in.addData(bids.filter(_.b_date_time.getTime < cut))
      q.processAllAvailable()
      rin.addData(rates.filter(_.rtime.getTime >= cut))
      in.addData(bids.filter(_.b_date_time.getTime >= cut))
      q.processAllAvailable()
      val streamed = spark.table("asof_stream_test")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
          r.getTimestamp(3), r.getDouble(4))).toSet
      val batchLeft = bids.toDF().withColumn("bkey", pmod($"auction", lit(10)))
      val expected = graft.plans.AsOfJoinOp.asofJoin(
          batchLeft, rates.toDF(), "bkey", "rkey", "b_date_time", "rtime")
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
          r.getTimestamp(3), r.getDouble(7))).toSet
      assert(streamed == expected,
        s"stream-only=${(streamed -- expected).take(3)} batch-only=${(expected -- streamed).take(3)}")
    } finally q.stop()
  }

  test("watermark drops late events — the documented delta from the reference") {
    // The reference never drops late data (it assumes in-order sources,
    // SURVEY §2.9); Spark's watermark is additive capability. This pins
    // the semantics: an event arriving behind the watermark is excluded
    // from its (already finalized) window.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1_436_918_400_000L
    def bid(sec: Int, auction: Int) =
      Bid(auction, 1, 100, new Timestamp(t0 + sec * 1000L))
    val in = MemoryStream[Bid]
    val q = StreamOps.toMemory(
      StreamOps.tumblingCounts(in.toDF(), "10 seconds", "0 seconds"),
      "late_test", OutputMode.Append)
    try {
      in.addData(Seq(bid(1, 7), bid(2, 7))); q.processAllAvailable()
      // advance event time well past the first window -> it finalizes
      in.addData(Seq(bid(25, 9))); q.processAllAvailable()
      // a late arrival for the first window: behind the watermark, dropped
      in.addData(Seq(bid(3, 7))); q.processAllAvailable()
      in.addData(Seq(bid(45, 9))); q.processAllAvailable()
      val counts = spark.table("late_test")
        .collect().map(r => (r.getTimestamp(0).getTime - t0) / 1000 -> r.getLong(2)).toMap
      assert(counts(0L) == 2, s"late event must not reopen window 0: $counts")
    } finally q.stop()
  }

  test("global (processing-time) window equals batch under the fixed clock") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set(graft.functions.ProcTime.ModeKey,
      graft.functions.ProcTime.Deterministic)
    try {
      val bids = mkBids(5000)
      val in = MemoryStream[Bid]
      val arrival = expr("b_date_time + INTERVAL 2 SECONDS")
      val q = StreamOps.toMemory(
        StreamOps.globalCounts(in.toDF(), "10 seconds", "0 seconds", arrival),
        "global_test", OutputMode.Complete)
      try {
        in.addData(bids.take(2000)); q.processAllAvailable()
        in.addData(bids.drop(2000)); q.processAllAvailable()
        val streamed = spark.table("global_test").collect()
          .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2))).toSet
        val batch = bids.toDF()
          .withColumn("p_time", expr("b_date_time + INTERVAL 2 SECONDS"))
          .groupBy(window($"p_time", "10 seconds").as("w"), $"bidder")
          .agg(count(lit(1)).as("n_bids"))
          .select($"w.start", $"bidder", $"n_bids").collect()
          .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2))).toSet
        assert(streamed == batch && streamed.nonEmpty)
      } finally q.stop()
    } finally spark.conf.unset(graft.functions.ProcTime.ModeKey)
  }

  test("streaming NEXMark q3 equals the batch local-sellers join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val n = 5000L
    val auctions = (0L until n).filter(Nexmark.kindOf(_) == 1)
      .map(Nexmark.genAuction(_, 1000))
    val persons = (0L until n).filter(Nexmark.kindOf(_) == 0)
      .map(Nexmark.genPerson(_, 1000)).toDF()
    val in = MemoryStream[Nexmark.Auction]
    val q = StreamOps.toMemory(
      StreamOps.localSellersStream(in.toDF(), persons),
      "nxq3_stream_test", OutputMode.Append)
    try {
      in.addData(auctions.take(auctions.size / 2)); q.processAllAvailable()
      in.addData(auctions.drop(auctions.size / 2)); q.processAllAvailable()
      val streamed = spark.table("nxq3_stream_test").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
      val batch = auctions.toDF().filter($"category" === 10)
        .join(persons.filter($"state".isin("or", "id", "ca")), $"seller" === $"p_id")
        .select($"name", $"city", $"state", $"a_id").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3))).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming YSB equals the batch campaign counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = graft.sources.Ysb.adEvents(spark, 5000).collect().toSeq
    val campaigns = graft.sources.Ysb.campaigns(spark).toDF()
    val in = MemoryStream[graft.sources.Ysb.AdEvent]
    val q = StreamOps.toMemory(
      StreamOps.ysbStream(in.toDF(), campaigns, "10 seconds", "0 seconds"),
      "ysb_stream_test", OutputMode.Complete)
    try {
      in.addData(events.take(2500))
      q.processAllAvailable()
      in.addData(events.drop(2500))
      q.processAllAvailable()
      val streamed = spark.table("ysb_stream_test").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = events.toDF().filter($"event_type" === "view")
        .join(broadcast(campaigns), $"ad_id" === $"c_ad_id")
        .groupBy(window($"event_time", "10 seconds").as("w"), $"campaign_id")
        .agg(count(lit(1)).as("n_views"))
        .select($"w.start", $"campaign_id", $"n_views").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("kafka reader/writer stubs configure without a connector") {
    val r = StreamOps.kafkaReader(spark, "broker:9092", "bids")
    assert(r != null) // format+options applied; .load() needs the connector jar
  }

  test("parquet sink round-trips a streamed projection") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bids = mkBids(1000)
    val in = MemoryStream[Bid]
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val q = StreamOps.toParquet(StreamOps.elementwise(in.toDF()),
      s"$tmp/out", s"$tmp/ckpt",
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    in.addData(bids)
    q.awaitTermination(60000)
    val written = spark.read.parquet(s"$tmp/out")
    assert(written.count() == bids.size)
    assert(written.columns.toSet == Set("auction", "bidder", "price", "b_date_time"))
  }

  test("streaming per-window quantiles bracket the true order statistics") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.LogHistogram
    val bids = mkBids(5000)
    val windowMs = 10_000L
    val in = MemoryStream[Bid]
    val q = StreamOps.toMemory(
      StreamOps.histQuantilesStream(in.toDS(), 10, "0 seconds").toDF(),
      "hq_test", OutputMode.Append)
    try {
      in.addData(bids.take(2000)); q.processAllAvailable()
      in.addData(bids.drop(2000)); q.processAllAvailable()
      // one far-future bid closes every earlier window
      val last = bids.last
      in.addData(last.copy(b_date_time =
        new Timestamp(last.b_date_time.getTime + 3_600_000L)))
      q.processAllAvailable()
      val out = spark.table("hq_test")
        .select($"w_start", $"n_rows", $"p50_est", $"p95_est", $"p99_est")
        .as[(Timestamp, Long, Long, Long, Long)].collect()
      assert(out.nonEmpty)
      val byWindow = bids.groupBy(b => b.b_date_time.getTime / windowMs * windowMs)
      out.foreach { case (w, n, p50, p95, p99) =>
        val prices = byWindow(w.getTime).map(_.price.toLong).sorted
        assert(n == prices.length)
        def truth(q: Int) = prices(
          math.min((prices.length.toLong * q + 99) / 100 - 1,
            prices.length - 1L).toInt.max(0))
        for ((est, qq) <- Seq((p50, 50), (p95, 95), (p99, 99))) {
          val t = truth(qq)
          assert(est <= t && (t < 4 || t < est * 2),
            s"w=$w q=$qq est=$est truth=$t")
        }
        // the estimate equals the histogram replay (same summary math)
        val h = prices.foldLeft(Map.empty[Long, Long])(LogHistogram.add)
        assert(p50 == LogHistogram.quantile(h, 50))
      }
      // every closed window reported exactly once
      assert(out.map(_._1.getTime).sorted.toSeq ==
        byWindow.keys.toSeq.sorted)
    } finally q.stop()
  }

  test("streaming heavy hitters: MG guarantees hold and windows emit once closed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamOps.DocEvent
    val t0 = 1_436_918_400_000L
    def doc(id: Long, sec: Int, text: String) =
      DocEvent(id, new Timestamp(t0 + sec * 1000L), text)
    val k = 4
    // window 0 ([t0, t0+10s)): 'alpha' dominates, long tail of singletons
    val w0 = Seq(
      doc(1, 0, "alpha alpha alpha alpha alpha beta beta gamma"),
      doc(2, 3, "alpha alpha beta delta epsilon zeta eta theta"),
      doc(3, 8, "alpha iota kappa lambda"))
    // a doc far past the window advances the watermark and closes w0
    val closer = Seq(doc(4, 3600, "closer tokens only"))
    val in = MemoryStream[DocEvent]
    val q = StreamOps.toMemory(
      StreamOps.heavyHittersStream(in.toDS(), 10, k, "0 seconds").toDF(),
      "hh_test", OutputMode.Append)
    try {
      in.addData(w0); q.processAllAvailable()
      // nothing emits while the window is open
      assert(spark.table("hh_test").count() == 0)
      in.addData(closer); q.processAllAvailable()
      val out = spark.table("hh_test")
        .select($"w_start", $"tok", $"est", $"n_tokens")
        .as[(Timestamp, String, Long, Long)].collect()
      assert(out.nonEmpty && out.forall(_._1.getTime == t0))
      val exact = w0.flatMap(_.text.split("\\s+"))
        .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      val n = exact.values.sum
      assert(out.forall(_._4 == n))
      assert(out.length <= k)
      val err = n / (k + 1)
      out.foreach { case (_, t, est, _) =>
        // MG never overcounts, and undercounts by at most n/(k+1)
        assert(est <= exact(t), s"$t overestimated")
        assert(exact(t) - est <= err, s"$t underestimated beyond bound")
      }
      // any token with true frequency > n/(k+1) must be retained
      val mustKeep = exact.filter(_._2 > err).keySet
      val kept = out.map(_._2).toSet
      assert(mustKeep.subsetOf(kept), s"missing ${mustKeep -- kept}")
    } finally q.stop()
  }
}
