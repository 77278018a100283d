package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.functions.TextHashes
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{DocEvent, NearDupHit}

/** nearDupLshStream: the streamed band-bucket collisions must equal a
  * driver-side brute force (arrival-order first-occupant per band
  * bucket, raw signature slices as bucket identity), must be invariant
  * to micro-batch boundaries, and the event-time TTL must evict idle
  * buckets so a re-arrival after the horizon claims a fresh bucket.
  */
class NearDupStreamSpec extends SparkSpec {

  private val bands = 8
  private val k = 16
  private val rows = k / bands

  /** Corpus docs in doc_id order with synthetic 1-second-spaced
    * timestamps (the sf0.001 corpus contains genuine near-dup pairs).
    */
  private lazy val docs: Seq[DocEvent] = {
    import spark.implicits._
    Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().sortBy(_._1).zipWithIndex.map { case ((id, text), i) =>
        DocEvent(id, new Timestamp(1700000000000L + i * 1000L), text)
      }.toSeq
  }

  /** Brute force: feed order, bucket key = (band, raw sig slice). */
  private def expectedHits(events: Seq[DocEvent]): Set[(Long, Int, Long)] = {
    val buckets = scala.collection.mutable.Map[(Int, Seq[Long]), Long]()
    val out = scala.collection.mutable.ArrayBuffer[(Long, Int, Long)]()
    events.foreach { e =>
      val sig = TextHashes.md5MinhashSigScala(e.text.split("\\s+").toSeq, k)
      (0 until bands).foreach { b =>
        val key = (b, sig.slice(b * rows, b * rows + rows).toSeq)
        buckets.get(key) match {
          case Some(first) => out += ((e.doc_id, b, first))
          case None => buckets(key) = e.doc_id
        }
      }
    }
    out.toSet
  }

  private def runStream(batches: Seq[Seq[DocEvent]], name: String,
      watermark: String = "1 hour",
      horizonMs: Long = 86400000L): Set[(Long, Int, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DocEvent]
    val q = StreamOps.toMemory(
      StreamOps.nearDupLshStream(in.toDS(), watermark, horizonMs, bands, k)
        .toDF(),
      name, OutputMode.Append)
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).as[NearDupHit].collect()
        .map(h => (h.doc_id, h.band, h.first_id)).toSet
    } finally q.stop()
  }

  test("streamed band collisions equal brute force (single batch)") {
    val sample = docs.take(200)
    assert(expectedHits(sample).nonEmpty, "corpus must contain near-dups")
    assert(runStream(Seq(sample), "neardup_one") == expectedHits(sample))
  }

  test("hits are invariant to micro-batch boundaries") {
    val sample = docs.take(200)
    val split3 = Seq(sample.take(70), sample.slice(70, 140), sample.drop(140))
    assert(runStream(split3, "neardup_three") == expectedHits(sample))
  }

  test("event-time TTL evicts idle buckets; re-arrival claims fresh") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    val a = DocEvent(1L, new Timestamp(t0), "alpha beta gamma delta epsilon")
    val filler1 = DocEvent(2L, new Timestamp(t0 + 60000L), "zeta eta theta")
    val filler2 = DocEvent(3L, new Timestamp(t0 + 61000L), "iota kappa mu")
    val aCopy = DocEvent(4L, new Timestamp(t0 + 62000L), a.text)
    val aCopy2 = DocEvent(5L, new Timestamp(t0 + 63000L), a.text)
    val in = MemoryStream[DocEvent]
    // watermark 1s, horizon 1s: a's buckets time out once the watermark
    // (driven past t0+1s by the fillers) overtakes them
    val q = StreamOps.toMemory(
      StreamOps.nearDupLshStream(in.toDS(), "1 second", 1000L, bands, k)
        .toDF(),
      "neardup_ttl", OutputMode.Append)
    try {
      Seq(Seq(a), Seq(filler1), Seq(filler2), Seq(aCopy), Seq(aCopy2))
        .foreach { b => in.addData(b); q.processAllAvailable() }
      val hits = spark.table("neardup_ttl").as[NearDupHit].collect()
      // aCopy found a's buckets EVICTED (claimed fresh, zero hits);
      // aCopy2 then collides with aCopy on every band
      assert(!hits.exists(_.doc_id == 4L))
      val h2 = hits.filter(_.doc_id == 5L)
      assert(h2.length == bands && h2.forall(_.first_id == 4L))
    } finally q.stop()
  }
}
