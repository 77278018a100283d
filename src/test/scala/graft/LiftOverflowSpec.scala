package graft

import org.apache.spark.sql.functions._

/** The int64 operand caps on the integer lift/ratio devices (q137's
  * `1000·cnt·total div (lc·rc)`, q112's idf_k cross-product) are
  * ENFORCED, not remembered: every graft session runs ANSI arithmetic
  * (pinned in Tables), so a corpus past the documented ~10⁹-token bound
  * makes the lift ERROR — the same behavior as DuckDB's BIGINT
  * arithmetic — instead of legacy mode's silent wrap into a
  * plausible-looking wrong value that would still hash-compare
  * "consistently" against nothing.
  */
class LiftOverflowSpec extends SparkSpec {

  test("every graft session runs ANSI arithmetic (pinned at the scan layer)") {
    Tables(spark, sfDir, "region").count() // Tables pins the conf
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
  }

  test("the q137 lift shape fails loudly past the int64 operand cap") {
    import spark.implicits._
    Tables(spark, sfDir, "region").count() // ensure the pinned conf
    // cnt·total at a corpus ~2^63/1000 tokens: 1000·2^40·2^23 overflows
    val df = Seq((1L << 40, 1L << 23, 7L, 9L)).toDF("cnt", "total", "lc", "rc")
    val e = intercept[Exception] {
      df.select(expr("(1000 * cnt * total) div (lc * rc)").as("lift"))
        .collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.toUpperCase.contains("OVERFLOW"),
      s"expected an arithmetic overflow error, got: ${e.getClass} $msg")
  }

  test("the q112 BM25 cross-product shape fails loudly past the cap") {
    import spark.implicits._
    Tables(spark, sfDir, "region").count()
    // idf_k·44·avg_mil·tf with a degenerate df=1 idf on a huge corpus
    val df = Seq((1L << 40, 1L << 20, 1L << 10, 5L))
      .toDF("idf_k", "avg_mil", "tf", "len")
    val e = intercept[Exception] {
      df.select(expr(
        """(idf_k * 44 * avg_mil * tf)
           div (20 * avg_mil * tf + 6 * avg_mil + 18 * len * 1000)""")
        .as("term_score")).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.toUpperCase.contains("OVERFLOW"),
      s"expected an arithmetic overflow error, got: ${e.getClass} $msg")
  }
}
