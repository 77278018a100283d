package graft

import java.util.Locale

import org.apache.spark.sql.SparkSession
import graft.streaming.StreamOps

/** Rate-vs-batch-size profile for the stateful streaming paths — ingest
  * (dedup→quality→langid→windowed counts, two stateful operators),
  * Misra-Gries heavy hitters, LSH near-dup banding, CDC upsert
  * materialization, and last-touch attribution — across micro-batch
  * size and state store provider:
  * `runMain graft.StreamProfile [maxBatch] [cpus]`.
  *
  * Motivation: the windowed NEXMark ops sustain 76–100k events/s while
  * the doc-keyed pipelines sit at ~7k docs/s; the dominant cost is
  * per-batch overhead (state-store commits + task launches per stateful
  * operator), which amortizes with batch size. The sweep holds
  * everything fixed except micro-batch size and provider, and prints
  * ONE JSON line whose rows locate the knee. Each config pre-generates
  * its own events (4 batches: 1 warm-up + 3 timed).
  */
object StreamProfile {

  def main(args: Array[String]): Unit = {
    val maxBatch = args.headOption.map(_.toInt).getOrElse(80000)
    val cpus = args.lift(1).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val providers = Seq(
      "hdfs" -> ("org.apache.spark.sql.execution.streaming.state." +
        "HDFSBackedStateStoreProvider"),
      "rocksdb" -> ("org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider"))
    val batches = Iterator.iterate(5000)(_ * 2).takeWhile(_ <= maxBatch).toSeq

    val rows = for {
      (store, cls) <- providers
      batch <- batches
    } yield {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", cls)
      val docs = StreamBench.genDocs(batch * 4)
      // event-keyed ops run at the raw batch size (the doc ops carry
      // ~40 tokens/doc, so their per-row work is an order heavier)
      val bids = StreamBench.genBids(batch * 4)
      import spark.implicits._
      val ingest = StreamBench.rateOf(spark, s"ingest/$store/$batch",
        docs, batch)(in => StreamOps.ingestPipelineStream(in.toDS(), "10 seconds"))
      val hh = StreamBench.rateOf(spark, s"hh/$store/$batch",
        docs, batch)(in => StreamOps.heavyHittersStream(in.toDS(),
        windowSecs = 10, k = 16, watermark = "0 seconds").toDF())
      val nd = StreamBench.rateOf(spark, s"neardup/$store/$batch",
        docs, batch)(in => StreamOps.nearDupLshStream(in.toDS(),
        "10 seconds", horizonMs = 10000L).toDF())
      val cdc = StreamBench.rateOf(spark, s"cdc/$store/$batch",
        StreamBench.genCdc(bids), bids.length / 4,
        org.apache.spark.sql.streaming.OutputMode.Update)(in =>
        StreamOps.cdcApplyStream(in.toDS()).toDF())
      val at = StreamBench.rateOf(spark, s"attrib/$store/$batch",
        StreamBench.genTouch(bids), bids.length / 4)(in =>
        StreamOps.attributionStream(in.toDS()).toDF())
      (store, batch, ingest._2, hh._2, nd._2, cdc._2, at._2)
    }

    val json = rows.map { case (store, batch, ing, hh, nd, cdc, at) =>
      String.format(Locale.ROOT,
        """{"store":"%s","batch":%d,"ingest_dps":%.0f,"hh_dps":%.0f,""" +
          """"neardup_dps":%.0f,"cdc_cps":%.0f,"attrib_eps":%.0f}""",
        store, Int.box(batch), Double.box(ing), Double.box(hh),
        Double.box(nd), Double.box(cdc), Double.box(at))
    }.mkString("[", ",", "]")
    println(s"""{"metric":"stream_profile","unit":"rows_per_sec","cpus":"$cpus","rows":$json}""")
    spark.stop()
  }
}
