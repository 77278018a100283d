package graft

import java.util.Locale

import org.apache.spark.sql.SparkSession
import graft.streaming.StreamOps

/** Rate-vs-batch-size profile for the two slowest streaming paths —
  * ingest (dedup→quality→langid→windowed counts, two stateful operators)
  * and Misra-Gries heavy hitters — across micro-batch size and state
  * store provider: `runMain graft.StreamProfile [maxBatch] [cpus]`.
  *
  * Motivation: the windowed NEXMark ops sustain 76–100k events/s while
  * these two sit at ~7k docs/s; the suspected cost is per-batch overhead
  * (state-store commits + task launches per stateful operator), which
  * amortizes with batch size. The sweep holds everything fixed except
  * micro-batch size and provider, and prints ONE JSON line whose rows
  * locate the knee. Each config pre-generates its own docs (4 batches: 1
  * warm-up + 3 timed).
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
      import spark.implicits._
      val ingest = StreamBench.rateOf(spark, s"ingest/$store/$batch",
        docs, batch)(in => StreamOps.ingestPipelineStream(in.toDS(), "10 seconds"))
      val hh = StreamBench.rateOf(spark, s"hh/$store/$batch",
        docs, batch)(in => StreamOps.heavyHittersStream(in.toDS(),
        windowSecs = 10, k = 16, watermark = "0 seconds").toDF())
      (store, batch, ingest._2, hh._2)
    }

    val json = rows.map { case (store, batch, ing, hh) =>
      String.format(Locale.ROOT,
        """{"store":"%s","batch":%d,"ingest_dps":%.0f,"hh_dps":%.0f}""",
        store, Int.box(batch), Double.box(ing), Double.box(hh))
    }.mkString("[", ",", "]")
    println(s"""{"metric":"stream_profile","unit":"docs_per_sec","cpus":"$cpus","rows":$json}""")
    spark.stop()
  }
}
