package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** q154 — the span-dedup ACTION operator. Pins (a) exact agreement with
  * a driver-side brute-force rewrite on a constructed boilerplate
  * corpus, (b) the budget/apply reconciliation (per-source removed mass
  * == q143's covered_tokens, on the driver fixture AND the skewed
  * corpus), and (c) nSeg degrade invariance.
  */
class SpanDedupApplySpec extends SparkSpec {

  private def mkDocs(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
      .withColumn("toks", split($"text", "\\s+"))
      .repartition(4)
  }

  // two docs sharing one 10-token boilerplate run (dup windows cover its
  // 10 tokens in both), one clean doc, one short doc (< 8 tokens)
  private def corpus = {
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    mkDocs(Seq(
      (1L, "s0", s"a1 a2 $boiler a3 a4"),
      (2L, "s0", s"c1 c2 c3 $boiler"),
      (3L, "s1", (1 to 12).map(i => s"u$i").mkString(" ")),
      (4L, "s1", "t1 t2 t3")))
  }

  /** Brute-force reference: mark every position covered by an 8-window
    * whose token text occurs in >= 2 distinct docs, strip, rejoin.
    */
  private def bruteForce(rows: Seq[(Long, String, String)])
      : Seq[(Long, String, String, Long, Long)] = {
    val toks = rows.map { case (id, src, text) =>
      (id, src, text.split("\\s+").toSeq)
    }
    val winDocs = scala.collection.mutable.Map[Seq[String], Set[Long]]()
    toks.foreach { case (id, _, ts) =>
      ts.sliding(8).filter(_.size == 8).foreach { w =>
        winDocs(w) = winDocs.getOrElse(w, Set.empty) + id
      }
    }
    toks.map { case (id, src, ts) =>
      val covered = ts.sliding(8).zipWithIndex
        .filter { case (w, _) => w.size == 8 && winDocs(w).size >= 2 }
        .flatMap { case (_, i) => i until i + 8 }.toSet
      val kept = ts.zipWithIndex.collect {
        case (t, i) if !covered.contains(i) => t
      }
      (id, src, kept.mkString(" "), ts.size.toLong,
        (ts.size - kept.size).toLong)
    }
  }

  test("q154 equals the brute-force rewrite on a constructed corpus") {
    import spark.implicits._
    val rows = Seq(
      (1L, "s0", s"a1 a2 ${(1 to 10).map(i => s"b$i").mkString(" ")} a3 a4"),
      (2L, "s0", s"c1 c2 c3 ${(1 to 10).map(i => s"b$i").mkString(" ")}"),
      (3L, "s1", (1 to 12).map(i => s"u$i").mkString(" ")),
      (4L, "s1", "t1 t2 t3"))
    val got = TextOps.spanDedupApply(mkDocs(rows), 1)
      .as[(Long, String, String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == bruteForce(rows).sortBy(_._1))
    // sanity on the shape: doc 1 keeps its unique head+tail, doc 2 its
    // head, doc 3/4 pass through untouched
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._3 == "a1 a2 a3 a4" && byId(1L)._5 == 10L)
    assert(byId(2L)._3 == "c1 c2 c3" && byId(2L)._5 == 10L)
    assert(byId(3L)._5 == 0L && byId(4L)._5 == 0L)
  }

  test("apply reconciles exactly with the q143 budget, fixture and skewed") {
    import spark.implicits._
    def reconcile(docsF: org.apache.spark.sql.DataFrame): Unit = {
      val budget = TextOps.spanDedupBudget(docsF, 1)
        .select($"source", $"covered_tokens").as[(String, Long)]
        .collect().toMap
      val applied = TextOps.spanDedupApply(docsF, 1)
        .groupBy($"source").agg(sum($"tokens_removed").as("rm"))
        .as[(String, Long)].collect().toMap
      assert(applied.keySet == budget.keySet)
      applied.foreach { case (src, rm) =>
        assert(rm == budget(src),
          s"source $src: applied removed $rm != budgeted ${budget(src)}")
      }
    }
    reconcile(corpus)
    reconcile(TextOps.docs(spark, sfDir))
  }

  test("q154 is invariant to the salt-split degrade (nSeg 1 vs 8)") {
    val plain = TextOps.spanDedupApply(corpus, 1).collect().toSeq
    val salted = TextOps.spanDedupApply(corpus, 8).collect().toSeq
    assert(salted == plain)
  }
}
