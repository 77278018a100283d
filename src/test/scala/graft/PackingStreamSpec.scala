package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{PackDoc, PackRow}

/** packingStream: for in-order (per-source ascending doc_id) delivery,
  * the emitted loader-manifest rows must equal the batch q176 manifest
  * restricted to the delivered prefix — for EVERY batching of the
  * corpus, with rows scrambled inside each micro-batch (the handler
  * re-sorts by doc_id), and cumulatively at every batch boundary.
  */
class PackingStreamSpec extends SparkSpec {

  /** Batch q176 manifest keyed by doc_id. */
  private def batchManifest: Map[Long, (String, Long, Long, Long, Long)] = {
    import spark.implicits._
    SparkEntry.queries("q176_sequence_packing")(spark, sfDir)
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
  }

  /** The corpus as PackDocs in global doc_id order (per-source ascending). */
  private def feed: Seq[PackDoc] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Tables(spark, sfDir, "documents")
      .select($"doc_id", $"source",
        when($"text".isNull, 0L)
          .otherwise(size(split($"text", "\\s+")).cast("long")).as("n_tok"))
      .as[PackDoc].collect().toSeq.sortBy(_.doc_id)
  }

  private def runStream(batches: Seq[Seq[PackDoc]], name: String,
      checkEachBatch: Boolean = false): Seq[PackRow] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[PackDoc]
    val q = StreamOps.toMemory(
      StreamOps.packingStream(in.toDS()).toDF(), name, OutputMode.Append)
    try {
      var delivered = Set.empty[Long]
      batches.foreach { b =>
        in.addData(b); q.processAllAvailable()
        delivered ++= b.map(_.doc_id)
        if (checkEachBatch) {
          val got = spark.table(name).as[PackRow].collect()
          assert(got.length === delivered.size)
          checkAgainst(got.toSeq)
        }
      }
      spark.table(name).as[PackRow].collect().toSeq
    } finally q.stop()
  }

  private def checkAgainst(got: Seq[PackRow]): Unit = {
    val want = batchManifest
    got.foreach { r =>
      val (src, nTok, off, first, splits) = want(r.doc_id)
      assert(r.source === src)
      assert(r.n_tok === nTok, s"doc ${r.doc_id}")
      assert(r.offset === off, s"doc ${r.doc_id}")
      assert(r.seq_first === first, s"doc ${r.doc_id}")
      assert(r.n_splits === splits, s"doc ${r.doc_id}")
    }
  }

  test("one batch equals the batch manifest") {
    val got = runStream(Seq(feed), "pack_one")
    assert(got.length === feed.length)
    checkAgainst(got)
  }

  test("any batching equals the batch manifest at every boundary") {
    val got = runStream(feed.grouped(17).toSeq, "pack_17",
      checkEachBatch = true)
    assert(got.length === feed.length)
    checkAgainst(got)
  }

  test("within-batch scrambles are absorbed by the handler sort") {
    val rnd = new scala.util.Random(7)
    val batches = feed.grouped(23).map(b => rnd.shuffle(b)).toSeq
    val got = runStream(batches, "pack_scram")
    assert(got.length === feed.length)
    checkAgainst(got)
  }

  test("offsets are contiguous per source (no gaps, no overlaps)") {
    val got = runStream(feed.grouped(11).toSeq, "pack_contig")
    got.groupBy(_.source).values.foreach { rows =>
      val sorted = rows.sortBy(_.doc_id)
      sorted.foldLeft(0L) { (expOff, r) =>
        assert(r.offset === expOff, s"doc ${r.doc_id}")
        expOff + r.n_tok
      }
    }
  }
}
