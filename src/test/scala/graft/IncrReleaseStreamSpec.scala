package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{Admission, IncrDoc}

/** incrementalReleaseStream: the online admission against the STORED
  * release digest must equal a driver arrival-order replay of the
  * frozen-state rules — quality window, exact-dup vs the stored text
  * digest, coverage vs the stored window digest, per-language prefix
  * budget over the stored remainders — under any batching, with
  * within-batch scrambles absorbed by the group sort.
  */
class IncrReleaseStreamSpec extends SparkSpec {

  private lazy val digestDir: String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_incr_stream/digest"
    graft.operators.PipelineOps.writeReleaseDigest(spark, sfDir, dir)
    dir
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  private lazy val events: Seq[IncrDoc] = {
    import spark.implicits._
    Tables(spark, sfDir, "documents").filter($"doc_id" % 7 === 6)
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
      .map { case (id, l, t) => IncrDoc(id, new Timestamp(id), l, t) }
  }

  /** Arrival-order driver replay against the store's own relations. */
  private lazy val expected: Seq[Admission] = {
    import spark.implicits._
    val thSet = spark.read.parquet(s"$digestDir/textdig")
      .as[Long].collect().toSet
    val winSet = spark.read.parquet(s"$digestDir/windig")
      .as[String].collect().toSet
    val remaining = spark.read.parquet(s"$digestDir/budgets")
      .select($"lang", $"remaining").as[(String, Long)].collect().toMap
    val spent = scala.collection.mutable.HashMap[String, (Long, Long)]()
    events.flatMap { e =>
      val toks = e.text.split("\\s+")
      val n = toks.length.toLong
      if (n < 20 || n > 1000 || thSet.contains(h60(e.text))) None
      else {
        val dupIs = toks.sliding(8).zipWithIndex
          .filter { case (w, _) => winSet.contains(
            md5hex(w.mkString(" ")).substring(0, 16)) }
          .map(_._2 + 1).toSeq
        val cov = dupIs.foldLeft((0L, Option.empty[Int])) {
          case ((acc, prev), i) =>
            (acc + prev.map(p => math.min(8, i - p)).getOrElse(8).toLong,
              Some(i))
        }._1
        val nClean = n - cov
        if (nClean < 1) None
        else {
          val (sp, kp) = spent.getOrElse(e.lang, (0L, 0L))
          val cum = sp + nClean
          val ok = cum <= remaining.getOrElse(e.lang, 0L)
          val kept = kp + (if (ok) 1L else 0L)
          spent(e.lang) = (cum, kept)
          Some(Admission(e.lang, e.doc_id, ok, cum, kept))
        }
      }
    }
  }

  private def run(batches: Seq[Seq[IncrDoc]], name: String): Seq[Admission] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val in = MemoryStream[IncrDoc]
      val q = StreamOps.toMemory(
        StreamOps.incrementalReleaseStream(in.toDS(), digestDir).toDF(),
        name, OutputMode.Append)
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
        spark.table(name).as[Admission].collect().toSeq
      } finally q.stop()
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("online admission equals the driver replay at every batching") {
    assert(expected.nonEmpty, "fixture admits nothing — weaken alarm")
    assert(expected.exists(_.admitted) || expected.forall(!_.admitted))
    Seq(7, 23, events.size).zipWithIndex.foreach { case (k, ix) =>
      val got = run(events.grouped(k).toSeq, s"incr_$k$ix")
      assert(got.sortBy(_.doc_id) === expected.sortBy(_.doc_id),
        s"batching $k diverged from the driver replay")
    }
    // within-batch scramble absorbed by the group sort
    val scrambled = run(Seq(new scala.util.Random(5).shuffle(events)),
      "incr_scram")
    assert(scrambled.sortBy(_.doc_id) === expected.sortBy(_.doc_id))
  }

  test("the frozen digest gates actually bite on the fixture") {
    import spark.implicits._
    val thSet = spark.read.parquet(s"$digestDir/textdig")
      .as[Long].collect().toSet
    val winSet = spark.read.parquet(s"$digestDir/windig")
      .as[String].collect().toSet
    // some arriving window hits the frozen span digest (the path the
    // online rule shares with q189's old_count >= 1 term)
    val hits = events.map { e =>
      val toks = e.text.split("\\s+")
      if (toks.length < 20) 0
      else toks.sliding(8).count(w =>
        winSet.contains(md5hex(w.mkString(" ")).substring(0, 16)))
    }.sum
    assert(hits > 0, "no arriving window hit the stored digest")
    assert(thSet.nonEmpty && winSet.nonEmpty)
  }
}
