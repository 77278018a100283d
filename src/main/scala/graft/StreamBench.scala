package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.sources.Nexmark
import graft.sources.Nexmark.Bid
import graft.streaming.StreamOps

/** Streaming throughput bench — the reference's canonical invocation is
  * NEXMark q5 at 1000 events/s for 10 s (BASELINE.md row 1); Spark
  * ingests far faster than the reference's paced generator, so this
  * measures the SUSTAINED rate: pre-generated bids pushed through the
  * hopping-window hot-items aggregation (q5's shape) in fixed-size
  * micro-batches, reporting bids/second of end-to-end processing.
  *
  * Usage: runMain graft.StreamBench [nBids] [batchSize] [cpus]
  * Prints one line: streaming_q5_eps=<n> (bids/s) and the session
  * variant streaming_q11_eps.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val nBids = args.headOption.map(_.toInt).getOrElse(200000)
    val batchSize = args.lift(1).map(_.toInt).getOrElse(20000)
    val cpus = args.lift(2).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // events must exist before timing starts: the generator's cost is the
    // source's, not the engine's (the reference also pre-generates epochs)
    val bids: Seq[Bid] = (0L until (nBids.toLong * Nexmark.ProportionDenominator
        / Nexmark.BidProportion))
      .filter(Nexmark.kindOf(_) == 2).map(Nexmark.genBid(_, 1000))

    def run(name: String, build: MemoryStream[Bid] => org.apache.spark.sql.DataFrame,
        mode: OutputMode): Double = {
      val in = MemoryStream[Bid]
      val q = build(in).writeStream.format("noop").outputMode(mode).start()
      // one untimed warm-up batch: session/codegen/state-store start-up cost
      // belongs to neither query's sustained rate
      val chunks = bids.grouped(batchSize).toSeq
      in.addData(chunks.head)
      q.processAllAvailable()
      val timed = chunks.tail
      val t0 = System.nanoTime()
      timed.foreach { chunk =>
        in.addData(chunk)
        q.processAllAvailable()
      }
      val secs = (System.nanoTime() - t0) / 1e9
      q.stop()
      val eps = timed.map(_.size).sum / secs
      Console.err.println(f"[StreamBench] $name: $eps%.0f events/s over ${timed.size} batches")
      eps
    }

    val q5Eps = run("q5",
      in => StreamOps.hoppingCounts(in.toDF(), "10 seconds", "5 seconds", "0 seconds"),
      OutputMode.Append)
    val q11Eps = run("q11",
      in => StreamOps.sessionCounts(in.toDF(), "10 seconds", "0 seconds"),
      OutputMode.Append)

    // LLM-ingest pipeline rate (docs/s): dedup -> quality -> langid ->
    // windowed counts, the two-stateful-operator chain. Word-salad docs,
    // deterministic per id; ts advances 1 ms/doc so watermark eviction
    // keeps dedup state horizon-bounded like production.
    import graft.streaming.StreamOps.DocEvent
    val vocab = Vector("the", "of", "and", "to", "in", "is", "der", "und",
      "ist", "ein", "el", "la", "los", "y", "es", "le", "les", "et", "est",
      "un", "alpha", "beta", "gamma", "delta", "omega", "kappa", "sigma",
      "tau", "zeta", "lambda")
    val docBatch = math.max(1, batchSize / 10)
    val nDocs = math.max(nBids / 10, docBatch * 2)
    val docEvents: Seq[DocEvent] = (0L until nDocs.toLong).map { id =>
      val rng = new Nexmark.Rng(id)
      val n = 20 + rng.nextInt(40)
      val text = Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" ")
      DocEvent(id, new java.sql.Timestamp(1_436_918_400_000L + id), text)
    }
    def runDocs(name: String): Double = {
      val in = MemoryStream[DocEvent]
      val q = StreamOps.ingestPipelineStream(in.toDS(), "10 seconds")
        .writeStream.format("noop").outputMode(OutputMode.Append).start()
      val chunks = docEvents.grouped(docBatch).toSeq
      in.addData(chunks.head)
      q.processAllAvailable()
      val timed = chunks.tail
      val t0 = System.nanoTime()
      timed.foreach { chunk => in.addData(chunk); q.processAllAvailable() }
      val secs = (System.nanoTime() - t0) / 1e9
      q.stop()
      val dps = timed.map(_.size).sum / secs
      Console.err.println(f"[StreamBench] $name: $dps%.0f docs/s over ${timed.size} batches")
      dps
    }
    val ingestDps = runDocs("ingest")

    // CEP funnel rate (events/s): per-user flatMapGroupsWithState sequence
    // matching with event-time idle timeout — state evicts as the
    // watermark advances, so the steady-state rate reflects bounded state.
    val funnelSteps = Seq("view", "click", "purchase")
    val funnelEvents: Seq[StreamOps.FunnelEvent] = bids.map(b =>
      StreamOps.FunnelEvent(b.bidder.toLong, b.b_date_time,
        funnelSteps(((b.auction % 3) + 3) % 3)))
    def runFunnel(name: String): Double = {
      val in = MemoryStream[StreamOps.FunnelEvent]
      val q = StreamOps.funnelStream(in.toDS(), funnelSteps,
          gapMs = 10_000L, idleCloseMs = 10_000L, watermark = "0 seconds")
        .toDF().writeStream.format("noop").outputMode(OutputMode.Append).start()
      val chunks = funnelEvents.grouped(batchSize).toSeq
      in.addData(chunks.head)
      q.processAllAvailable()
      val timed = chunks.tail
      val t0 = System.nanoTime()
      timed.foreach { chunk => in.addData(chunk); q.processAllAvailable() }
      val secs = (System.nanoTime() - t0) / 1e9
      q.stop()
      val eps = timed.map(_.size).sum / secs
      Console.err.println(f"[StreamBench] $name: $eps%.0f events/s over ${timed.size} batches")
      eps
    }
    val funnelEps = runFunnel("funnel")
    println(f"streaming_q5_eps=${q5Eps}%.0f streaming_q11_eps=${q11Eps}%.0f " +
      f"streaming_ingest_dps=${ingestDps}%.0f " +
      f"streaming_funnel_eps=${funnelEps}%.0f " +
      s"(n=${bids.size}, batch=$batchSize, cpus=$cpus)")
    spark.stop()
  }
}
