package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{DocEvent, DsirVerdict, WatermarkVerdict}

/** The two stateless ingestion taps added alongside decontamStream:
  * watermarkDetectStream (q186's online form) and dsirAdmitStream
  * (q185's importance weight against a frozen 256-bucket config).
  * Both must equal a driver brute force of the batch definition under
  * any batching and any delivery order, and their JVM hash device
  * (md5Hash60) must be bit-equal to the engine/oracle SQL identity.
  */
class CurationTapStreamSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  private lazy val corpus: Seq[(Long, String)] = {
    import spark.implicits._
    Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().toSeq.sortBy(_._1)
  }
  private def events: Seq[DocEvent] =
    corpus.map { case (id, t) => DocEvent(id, new Timestamp(id), t) }

  private def runStream[T <: Product : org.apache.spark.sql.Encoder](
      batches: Seq[Seq[DocEvent]], name: String,
      mk: org.apache.spark.sql.Dataset[DocEvent] =>
        org.apache.spark.sql.Dataset[T]): Seq[T] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DocEvent]
    val q = StreamOps.toMemory(mk(in.toDS()).toDF(), name, OutputMode.Append)
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).as[T].collect().toSeq
    } finally q.stop()
  }

  test("md5Hash60 equals the SQL conv(substring(md5,1,15),16,10) identity") {
    import spark.implicits._
    val samples = Seq("a", "the quick", "τoken-ü", "x|y|wm1", "")
    val sql = samples.toDF("s")
      .select(expr("CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)"))
      .as[Long].collect().toSeq
    assert(sql == samples.map(StreamOps.md5Hash60))
  }

  test("watermarkDetectStream equals brute force under any batching/order") {
    import spark.implicits._
    val expected = corpus.map { case (id, text) =>
      val t = text.split("\\s+", -1)
      val m = math.max(0, t.length - 1).toLong
      val g = (0 until t.length - 1).count { i =>
        h60(t(i) + "|" + t(i + 1) + "|wm1") % 2 == 0
      }.toLong
      val scored = m >= 16
      val d = 2 * g - m
      WatermarkVerdict(id, m, g, scored, scored && d > 0 && d * d > 4 * m)
    }.sortBy(_.doc_id)
    val got = runStream[WatermarkVerdict](events.grouped(23).toSeq,
      "wm_23", ds => StreamOps.watermarkDetectStream(ds))
    assert(got.sortBy(_.doc_id) == expected)
    assert(expected.exists(_.scored))
    val scrambled = runStream[WatermarkVerdict](
      Seq(new scala.util.Random(7).shuffle(events)), "wm_scram",
      ds => StreamOps.watermarkDetectStream(ds))
    assert(scrambled.sortBy(_.doc_id) == expected)
  }

  test("dsirAdmitStream weights equal batch q185's per-doc weights") {
    import spark.implicits._
    val bd = graft.operators.PipelineOps.dsirBitdiffs(spark, sfDir)
    assert(bd.length == 256)
    // independent driver reference: the CurationExtrasSpec q185 model,
    // restricted to the weight (bitdiffs recomputed from raw counts)
    val B = 256L
    def grams(t: Array[String]): Seq[String] =
      t.toSeq ++ (0 until t.length - 1).map(i => t(i) + " " + t(i + 1))
    val tgtC = new scala.collection.mutable.HashMap[Long, Long]()
    val rawC = new scala.collection.mutable.HashMap[Long, Long]()
    corpus.foreach { case (id, text) =>
      val m = if (id % 23 == 5) tgtC else rawC
      grams(text.split("\\s+")).foreach { g =>
        val b = h60(g) % B; m(b) = m.getOrElse(b, 0L) + 1
      }
    }
    val tn = tgtC.values.sum; val rn = rawC.values.sum
    def f(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    def bitdiff(b: Long): Long =
      (f(rn + B) - f(rawC.getOrElse(b, 0L) + 1)) -
        (f(tn + B) - f(tgtC.getOrElse(b, 0L) + 1))
    val expected = corpus.map { case (id, text) =>
      // the stream hashes with split(-1) semantics, same as the engine
      val w = grams(text.split("\\s+", -1))
        .map(g => bitdiff(h60(g) % B)).sum
      (id, w)
    }.toMap
    // config derived from the frame == config derived by brute force
    (0 until 256).foreach { b =>
      assert(bd(b) == bitdiff(b.toLong), s"bucket $b config mismatch")
    }
    val thr = expected.values.toSeq.sorted.apply(expected.size / 2) // median
    val got = runStream[DsirVerdict](events.grouped(31).toSeq,
      "dsir_31", ds => StreamOps.dsirAdmitStream(ds, bd, thr))
    got.foreach { v =>
      assert(v.weight == expected(v.doc_id), s"doc ${v.doc_id}")
      assert(v.admitted == (v.weight >= thr))
    }
    assert(got.exists(_.admitted) && got.exists(!_.admitted))
    // replay invariance: same batch twice -> second delivery appends
    // identical verdicts (stateless)
    val twice = runStream[DsirVerdict](
      Seq(events.take(40), events.take(40)), "dsir_replay",
      ds => StreamOps.dsirAdmitStream(ds, bd, thr))
    assert(twice.size == 80 &&
      twice.groupBy(_.doc_id).values.forall(vs => vs.distinct.size == 1))
  }
}
