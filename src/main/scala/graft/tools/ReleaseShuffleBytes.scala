package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamOps

/** Measures what the release pipeline's stateful exchanges actually
  * carry: total shuffle bytes written across the run next to the corpus
  * text mass. The round-10 restructure computes fingerprint + quality
  * gate + language vote map-side and drops text BEFORE the dedup
  * shuffle, so the exchanges move fixed-width rows; this tool prints
  * the ratio that proves it (and would read ≥ 1× text mass if document
  * bodies ever rode a shuffle again). Local micro-batch rate barely
  * notices (an in-memory exchange is cheap and per-batch state commits
  * dominate at 10k-doc batches); on a real cluster the exchange is the
  * network, which is why the payload — not the local dps — is the
  * number that scales.
  *
  * Usage: runMain graft.tools.ReleaseShuffleBytes [nDocs=40000] [batch=10000]
  */
object ReleaseShuffleBytes {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(40000)
    val batch = args.lift(1).map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = graft.StreamBench.genDocs(nDocs)
    val textBytes = docs.map(_.text.getBytes("UTF-8").length.toLong).sum

    val shuffleBytes = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffleBytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)

    val key = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    spark.conf.set(key, "false")
    val in = MemoryStream[StreamOps.DocEvent]
    val q = StreamOps.releaseAdmissionStream(in.toDS(), "10 seconds",
        budget = Long.MaxValue / 2)
      .toDF().writeStream.format("noop").outputMode(OutputMode.Append).start()
    docs.grouped(batch).foreach { c => in.addData(c); q.processAllAvailable() }
    q.stop()
    spark.sparkContext.removeSparkListener(listener)

    val sb = shuffleBytes.get()
    println(f"[release-shuffle] docs=$nDocs text_bytes=$textBytes " +
      f"shuffle_bytes_written=$sb ratio=${sb.toDouble / textBytes}%.3f")
    spark.stop()
  }
}
