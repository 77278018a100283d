package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps

/** Online exact AUC (aucMonitorStream): after every micro-batch the
  * emitted row per touched source must equal the q196 arithmetic over
  * exactly the delivered prefix — counts are order-free, so scrambled
  * delivery and re-batching change nothing.
  */
class AucMonitorStreamSpec extends SparkSpec {

  private def frame(): Array[StreamOps.ScoreEvent] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val toks = r.getString(2).split("\\s+", -1)
        val n = toks.length
        StreamOps.ScoreEvent(r.getString(1),
          (toks.distinct.length.toLong * 1000 / n).toInt,
          if (n >= 20 && n <= 1000) 1 else 0)
      }

  private def exactAuc(xs: Seq[StreamOps.ScoreEvent]): StreamOps.AucRow = {
    val pos = xs.filter(_.y == 1).map(_.score.toLong)
    val neg = xs.filter(_.y == 0).map(_.score.toLong)
    val auc = if (pos.isEmpty || neg.isEmpty) -1L
      else {
        val num = (for (p <- pos; q <- neg) yield {
          if (p > q) 2L else if (p == q) 1L else 0L
        }).sum
        1000L * num / (2L * pos.length * neg.length)
      }
    StreamOps.AucRow(xs.head.source, xs.size.toLong, pos.length.toLong, auc)
  }

  test("rolling AUC equals the prefix-exact metric at every boundary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = new scala.util.Random(31).shuffle(frame().toSeq)
    val batches = Seq(events.take(40), events.slice(40, 41),
      events.slice(41, 160), events.drop(160))
    val in = MemoryStream[StreamOps.ScoreEvent]
    val q = StreamOps.toMemory(
      StreamOps.aucMonitorStream(in.toDS()).toDF(), "auc_mon",
      OutputMode.Update)
    try {
      val expected = scala.collection.mutable.ArrayBuffer[StreamOps.AucRow]()
      var delivered = Seq.empty[StreamOps.ScoreEvent]
      batches.filter(_.nonEmpty).foreach { b =>
        in.addData(b); q.processAllAvailable()
        delivered = delivered ++ b
        val touched = b.map(_.source).toSet
        touched.foreach { src =>
          expected += exactAuc(delivered.filter(_.source == src))
        }
      }
      val got = spark.table("auc_mon").as[StreamOps.AucRow].collect()
      assert(got.sortBy(r => (r.source, r.n)).toSeq ==
        expected.sortBy(r => (r.source, r.n)).toSeq)
    } finally q.stop()
  }

  test("final rolling AUC matches the batch q196 per source") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = frame()
    val in = MemoryStream[StreamOps.ScoreEvent]
    val q = StreamOps.toMemory(
      StreamOps.aucMonitorStream(in.toDS()).toDF(), "auc_mon_final",
      OutputMode.Update)
    try {
      in.addData(events.toSeq); q.processAllAvailable()
      val got = spark.table("auc_mon_final").as[StreamOps.AucRow].collect()
        .map(r => r.source -> r.auc_permille).toMap
      val batch = graft.operators.TextOps.defs("q196_auc_exact")(spark, sfDir)
        .collect().filter(_.getString(0) != "__all__")
        .map(r => r.getString(0) -> r.getLong(4)).toMap
      assert(got == batch)
    } finally q.stop()
  }

  test("an out-of-domain score fails the stream loudly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamOps.ScoreEvent]
    val q = StreamOps.toMemory(
      StreamOps.aucMonitorStream(in.toDS()).toDF(), "auc_mon_bad",
      OutputMode.Update)
    try {
      in.addData(StreamOps.ScoreEvent("s", 1001, 1))
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(e.getMessage != null)
    } finally q.stop()
  }
}
