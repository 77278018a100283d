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

  test("releaseAdmissionStream == driver replay of dedup->quality->langid->budget") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stop = Map(
      "en" -> Set("a", "the", "of", "and", "to", "in", "is"),
      "de" -> Set("der", "die", "das", "und", "ist", "ein"),
      "es" -> Set("el", "la", "los", "de", "y", "es", "un"),
      "fr" -> Set("le", "la", "les", "et", "est", "un", "des"))
    // deterministic docs with langid signal, one exact dup, one short doc
    def doc(id: Long, text: String) = StreamOps.DocEvent(
      id, new java.sql.Timestamp(1700000000000L + id), text)
    val events = Seq(
      doc(1L, "the cat sat on the mat and the dog is here now today ok"),
      doc(2L, "der hund ist ein tier und der baum ist hier auch heute ja"),
      doc(3L, "the cat sat on the mat and the dog is here now today ok"), // dup of 1
      doc(4L, "too short"),                                               // quality drop
      doc(5L, "el gato es un animal y la casa es de los dos aqui hoy"),
      doc(6L, "a big the day of all and some to go in here is fine more"))
    // driver replay: dedup by text (first id), 3..1000 tokens, argmax
    // stopword lang (tie order de,en,es,fr; 0 -> unknown), then the
    // greedy prefix per lang in doc_id order with budget 20
    val survivors = events.groupBy(_.text).map(_._2.minBy(_.doc_id)).toSeq
      .sortBy(_.doc_id)
      .map(e => (e.doc_id, e.text.split("\\s+").toSeq))
      .filter { case (_, t) => t.size >= 3 && t.size <= 1000 }
      .map { case (id, t) =>
        val scores = stop.map { case (l, ws) => l -> t.count(ws) }
        val best = scores.values.max
        val lang = if (best == 0) "unknown"
          else Seq("de", "en", "es", "fr").find(scores(_) == best).get
        (id, lang, t.size.toLong)
      }
    val budget = 20L
    val expected = survivors.groupBy(_._2).flatMap { case (lang, ds) =>
      var cum = 0L
      ds.sortBy(_._1).map { case (id, _, n) =>
        cum += n; (lang, id, cum <= budget, cum)
      }
    }.toSet
    val in = MemoryStream[StreamOps.DocEvent]
    val prev = spark.conf.getOption(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
    spark.conf.set(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val q = StreamOps.toMemory(
      StreamOps.releaseAdmissionStream(in.toDS(), "10 seconds", budget).toDF(),
      "rel_adm", OutputMode.Append)
    try {
      events.grouped(2).foreach { b => in.addData(b); q.processAllAvailable() }
      val got = spark.table("rel_adm").as[Admission].collect()
        .map(a => (a.lang, a.doc_id, a.admitted, a.cum)).toSet
      assert(got == expected, s"\n got $got\nwant $expected")
    } finally {
      q.stop()
      prev.foreach(v => spark.conf.set(
        "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", v))
    }
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
