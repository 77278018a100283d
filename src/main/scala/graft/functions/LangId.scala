package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** THE stopword-vote language-ID definition — one shared scorer for
  * every batch and streaming path that predicts a language (q35, the
  * q65 ingest pipeline, `ingestPipelineStream`,
  * `releaseAdmissionStream`). Factored to a single object so the online
  * admission path and the batch curation path can never drift: tuning a
  * stopword list or the tie-break order changes every consumer at once,
  * and the DuckDB oracles replay these exact lists.
  *
  * The vote is an argmax over per-language stopword hit counts with a
  * FIXED de/en/es/fr tie-break (and `unknown` on zero evidence) — fully
  * deterministic, so both engines agree row-for-row. The scorer is a
  * codegen'd `filter` lambda over the token array: map-side, no UDF, no
  * shuffle — at 100 TB it rides whatever scan already tokenized.
  */
object LangId {

  /** Per-language stopword lists (whitespace-language heuristic). */
  val StopWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("a", "the", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "los", "de", "y", "es", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "des"))

  /** Adds one `score_<lang>` column per stopword list, counting hits in
    * the `toksCol` token array (deterministic fold order: language key
    * ascending).
    */
  def withScores(df: DataFrame, toksCol: String = "toks"): DataFrame =
    StopWords.toSeq.sortBy(_._1).foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"score_$lang", size(expr(
        s"filter($toksCol, t -> t IN (${words.map(w => s"'$w'").mkString(",")}))")))
    }

  /** The vote over [[withScores]]'s columns: `unknown` when no list
    * scored, else the best-scoring language under the fixed
    * de/en/es/fr tie order.
    */
  def vote: Column = {
    val best = greatest(lit(0), col("score_en"), col("score_de"),
      col("score_es"), col("score_fr"))
    when(best === 0, "unknown")
      .when(col("score_de") === best, "de")
      .when(col("score_en") === best, "en")
      .when(col("score_es") === best, "es")
      .otherwise("fr")
  }
}
