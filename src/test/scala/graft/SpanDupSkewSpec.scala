package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** q136/q143's hot-hash degrade path: a universal-boilerplate window
  * hash puts every doc's rows in ONE window partition (irreducibly one
  * task) under the catalog's nSeg = 1 plan. The `nSeg > 1` salt-split
  * form must (a) replace the h-partitioned window with per-(h, salt)
  * partial aggregates + a per-hash rollup join (a join probe streams
  * and AQE can skew-split it; a window partition can't be split), and
  * (b) leave the results byte-identical — counting distinct docs and
  * min≠max are invariant to how a hash's rows are salted.
  */
class SpanDupSkewSpec extends SparkSpec {

  // web-corpus-shaped skew: one 16-token boilerplate shared by EVERY doc
  // (its 9 interior 8-windows are universal — the hot hashes), a 4-token
  // unique tail per doc, plus a few fully-unique docs
  private def skewedDocs = {
    import spark.implicits._
    val boiler = (1 to 16).map(i => s"b$i").mkString(" ")
    val shared = (0L until 400L).map { id =>
      (id, s"src${id % 2}", s"$boiler u${id}a u${id}b u${id}c u${id}d")
    }
    val unique = (400L until 410L).map { id =>
      (id, "src2", (1 to 20).map(i => s"q${id}x$i").mkString(" "))
    }
    (shared ++ unique).toDF("doc_id", "source", "text")
      .withColumn("toks", split($"text", "\\s+"))
      .repartition(8) // force partial merges in the salted aggregates
  }

  test("dupSpanCoverage is invariant to the salt split (nSeg 1 vs 8)") {
    val plain = TextOps.dupSpanCoverage(skewedDocs, 1).collect().toSeq
    assert(plain.nonEmpty, "skewed corpus must surface duplicated docs")
    // every boilerplate doc: 9 of 13 windows duplicated -> kept by the
    // majority filter; unique docs must not appear
    assert(plain.size == 400)
    val salted = TextOps.dupSpanCoverage(skewedDocs, 8).collect().toSeq
    assert(salted == plain,
      "salt-split distinct-doc counts must be byte-identical to the window form")
  }

  test("spanDedupBudget is invariant to the salt split (nSeg 1 vs 8)") {
    val plain = TextOps.spanDedupBudget(skewedDocs, 1).collect().toSeq
    assert(plain.size == 3) // src0, src1, src2
    val bySrc = plain.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(bySrc("src2") == 0L, "fully-unique source has no removable mass")
    assert(bySrc("src0") > 0L && bySrc("src1") > 0L)
    val salted = TextOps.spanDedupBudget(skewedDocs, 8).collect().toSeq
    assert(salted == plain,
      "salt-split dup flags must be byte-identical to the window form")
  }

  test("the degrade plan replaces the h-window with salted partials + join") {
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    val p136 = planOf(TextOps.dupSpanCoverage(skewedDocs, 8))
    assert(!p136.contains("windowspecdefinition(h#"),
      s"degrade form must not window-partition by h:\n${p136.take(800)}")
    // the salt alias survives only as Catalyst's _groupingexpression —
    // assert the salted two-level aggregate by its pmod grouping key
    assert(p136.contains("_groupingexpression") || p136.contains("salt"),
      s"expected per-(h, salt) partial aggregate:\n${p136.take(1200)}")
    assert(p136.contains("Join"), "expected the per-hash rollup join-back")
    val p143 = planOf(TextOps.spanDedupBudget(skewedDocs, 8))
    assert(!p143.contains("windowspecdefinition(h#"),
      s"degrade form must not window-partition by h:\n${p143.take(800)}")
    // q143 keeps its doc_id-keyed lag window — only the h window goes
    assert(p143.contains("windowspecdefinition(doc_id#"),
      "the interval-union lag pass must survive")
    // and the catalog (nSeg = 1) plan still has NO join in q136's body
    val p1 = planOf(TextOps.dupSpanCoverage(skewedDocs, 1))
    assert(p1.contains("windowspecdefinition(h#") && !p1.contains("Join"),
      "nSeg = 1 must remain the pinned join-free window form")
  }

  test("q136's degrade materializes the pairs exchange once (ReusedExchange)") {
    // sum(least(cnt, 1)) in the salted branch references cnt on purpose:
    // count(cnt) gets rewritten to count(1), cnt is pruned, and the two
    // branches' pairs subtrees diverge — each re-scanning and re-hashing
    // the corpus (observed before this pin). Reuse shows only in the
    // final AQE plan, after execution.
    val df = TextOps.dupSpanCoverage(skewedDocs, 8)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("ReusedExchange"),
      s"degrade must share ONE (h, doc_id) exchange:\n${p.take(1600)}")
    assert(p.linesIterator.count(_.contains("Generate explode")) == 1,
      "degrade must hash the corpus once")
  }
}
