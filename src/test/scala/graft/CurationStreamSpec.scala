package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{Admission, CurationDoc}

/** tokenBudgetStream: under event-ordered delivery (seq = the batch
  * quality rank) the admitted set must equal batch q135's kept set —
  * across arbitrary micro-batch splits and with events scrambled inside
  * each batch (the handler re-orders by seq before charging).
  */
class CurationStreamSpec extends SparkSpec {

  private val budget = 3000L

  /** The fixture docs in q135's quality order, seq = per-lang rank. */
  private def orderedDocs: Seq[CurationDoc] = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    Tables(spark, sfDir, "documents")
      .select($"doc_id", $"lang", $"n_chars",
        coalesce(size(split($"text", "\\s+")).cast("long"), lit(1L))
          .as("n_tok"))
      .withColumn("seq", row_number().over(
        Window.partitionBy($"lang").orderBy($"n_chars".desc, $"doc_id"))
        .cast("long"))
      .select($"doc_id", $"seq", $"lang", $"n_tok")
      .as[CurationDoc].collect().toSeq
      .sortBy(d => (d.seq, d.lang)) // global feed order: best-first
  }

  /** Batch q135 reference: (lang -> (docs_kept, toks_kept)). */
  private def batchKept: Map[String, (Long, Long)] = {
    import spark.implicits._
    SparkEntry.queries("q135_token_budget")(spark, sfDir)
      .select($"lang", $"docs_kept", $"toks_kept")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
  }

  private def runStream(batches: Seq[Seq[CurationDoc]],
      name: String): Seq[Admission] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CurationDoc]
    val q = StreamOps.toMemory(
      StreamOps.tokenBudgetStream(in.toDS(), budget).toDF(),
      name, OutputMode.Append)
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).as[Admission].collect().toSeq
    } finally q.stop()
  }

  private def checkAgainstBatch(got: Seq[Admission]): Unit = {
    val want = batchKept
    val admitted = got.filter(_.admitted).groupBy(_.lang)
    // every language with a batch row admits the same docs/token mass
    want.foreach { case (lang, (docsKept, toksKept)) =>
      val a = admitted.getOrElse(lang, Seq.empty)
      assert(a.size.toLong == docsKept, s"$lang docs_kept")
      assert(a.map(_.cum).max == toksKept, s"$lang toks_kept")
    }
    // and no language admits anything the batch would not
    admitted.keys.foreach(l => assert(want.contains(l), s"$l not in batch"))
    // decisions exist for EVERY offered doc, admitted or not
    assert(got.map(_.doc_id).distinct.size == orderedDocs.size)
  }

  test("single batch, ordered delivery == batch q135") {
    checkAgainstBatch(runStream(Seq(orderedDocs), "cur_one"))
  }

  test("admission state carries across micro-batch splits") {
    val docs = orderedDocs
    val split = Seq(docs.take(docs.size / 3),
      docs.slice(docs.size / 3, 2 * docs.size / 3),
      docs.drop(2 * docs.size / 3))
    checkAgainstBatch(runStream(split, "cur_split"))
  }

  test("within-batch scrambling is normalized by the seq order") {
    val rng = new scala.util.Random(7)
    val scrambled = orderedDocs.grouped(orderedDocs.size / 2 + 1)
      .map(b => rng.shuffle(b)).toSeq
    checkAgainstBatch(runStream(scrambled, "cur_scram"))
  }

  test("overflow ends admission for the language (prefix rule)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // doc 2 overflows; doc 3 would fit alone but the prefix rule
    // charges doc 2's tokens, so 3 is rejected too (exactly q135)
    val docs = Seq(CurationDoc(1L, 1L, "xx", 2000L),
      CurationDoc(2L, 2L, "xx", 1500L), CurationDoc(3L, 3L, "xx", 500L))
    val got = runStream(Seq(docs), "cur_prefix").sortBy(_.doc_id)
    assert(got.map(_.admitted) == Seq(true, false, false))
    assert(got.map(_.cum) == Seq(2000L, 3500L, 4000L))
    assert(got.last.kept_count == 1L)
  }
}
