package graft

import org.apache.spark.sql.functions._
import graft.operators.{PipelineOps, TextOps}
import graft.plans.SkewSketch

/** Round-9 auto-trigger for the skew degrades (round-8 verdict item 1):
  * the operators pick nSeg THEMSELVES from a sampled hot-key sketch.
  * Pins both directions — a skewed corpus engages the degrade plan
  * automatically while a uniform corpus keeps the pinned nSeg = 1
  * shape — and that the chosen plan's results equal the manual form
  * (hash-green equivalence; the trigger may only change the plan).
  * Specs inject a small rows-per-task target + fraction 1.0 (sample =
  * whole relation, deterministic) because the production budgets are
  * sized for millions of rows, not spec corpora.
  */
class SkewAutoSpec extends SparkSpec {

  private def skewedDocs = {
    import spark.implicits._
    val boiler = (1 to 16).map(i => s"b$i").mkString(" ")
    ((0L until 400L).map { id =>
      (id, s"src${id % 2}", s"$boiler u${id}a u${id}b u${id}c u${id}d")
    } ++ (400L until 410L).map { id =>
      (id, "src2", (1 to 20).map(i => s"q${id}x$i").mkString(" "))
    }).toDF("doc_id", "source", "text")
      .withColumn("toks", split($"text", "\\s+"))
      .repartition(8)
  }

  private def uniformDocs = {
    import spark.implicits._
    (0L until 50L).map { id =>
      (id, "src0", (1 to 20).map(i => s"w${id}x$i").mkString(" "))
    }.toDF("doc_id", "source", "text")
      .withColumn("toks", split($"text", "\\s+"))
      .repartition(4)
  }

  test("pickNSeg: budget boundary, ceil split, MaxSeg cap") {
    assert(SkewSketch.pickNSeg(0L, 100L) == 1)
    assert(SkewSketch.pickNSeg(100L, 100L) == 1)
    assert(SkewSketch.pickNSeg(101L, 100L) == 2)
    assert(SkewSketch.pickNSeg(450L, 100L) == 5)
    assert(SkewSketch.pickNSeg(1000000L, 100L) == SkewSketch.MaxSeg)
  }

  test("span trigger: skew engages the degrade, uniform keeps the window plan") {
    // the hot boilerplate hash hits every shared doc -> est 400 > 100
    val nSkew = TextOps.spanAutoNSeg(skewedDocs, target = 100L, fraction = 1.0)
    assert(nSkew > 1, s"skewed corpus must trigger, got nSeg=$nSkew")
    val nUni = TextOps.spanAutoNSeg(uniformDocs, target = 100L, fraction = 1.0)
    assert(nUni == 1, s"uniform corpus must not trigger, got nSeg=$nUni")
    // and at the production budget the spec corpus is (rightly) below
    // the trigger — the default plan stays nSeg = 1
    assert(TextOps.spanAutoNSeg(skewedDocs, fraction = 1.0) == 1)
  }

  test("the auto-chosen span plan is the degrade shape with unchanged results") {
    val auto = TextOps.spanAutoNSeg(skewedDocs, target = 100L, fraction = 1.0)
    val manual = TextOps.dupSpanCoverage(skewedDocs, 1).collect().toSeq
    val chosen = TextOps.dupSpanCoverage(skewedDocs, auto)
    assert(chosen.collect().toSeq == manual,
      "auto-triggered degrade must be byte-identical to the window form")
    val plan = chosen.queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition(h#"),
      "auto-triggered plan must be the salt-split form")
    // budget + apply under the trigger stay reconciled with each other
    val budget = TextOps.spanDedupBudget(skewedDocs, auto)
    val applied = TextOps.spanDedupApply(skewedDocs, auto)
    val bySrc = budget.select("source", "covered_tokens")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rmBySrc = applied.groupBy(col("source"))
      .agg(sum(col("tokens_removed")).as("rm"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rmBySrc == bySrc)
  }

  test("graph trigger: hub skew engages, uniform bipartite graph does not") {
    import spark.implicits._
    // 3 hub suppliers each touched by every customer + a uniform fringe
    val hubEdges = (0L until 300L).flatMap { c =>
      (0L until 3L).map(hub => (c, hub)) :+ ((c, 100L + c % 7))
    }.toDF("c", "sk").repartition(8)
    val nHub = PipelineOps.graphAutoNSeg(hubEdges, target = 50L, fraction = 1.0)
    assert(nHub > 1, s"hub graph must trigger, got $nHub")
    val uniEdges = (0L until 300L).map(c => (c, c % 97)).toDF("c", "sk")
    val nUni = PipelineOps.graphAutoNSeg(uniEdges, target = 50L, fraction = 1.0)
    assert(nUni == 1, s"uniform graph must not trigger, got $nUni")
    // the triggered plan's ranks equal the manual nSeg = 1 form
    val manual = PipelineOps.graphRank(hubEdges, 1)
      .orderBy($"sk").collect().toSeq
    val auto = PipelineOps.graphRank(hubEdges, nHub)
      .orderBy($"sk").collect().toSeq
    assert(auto == manual,
      "auto-triggered hub split must be byte-identical to the plain form")
  }

  test("budgets are conf-derived: a session override moves the trigger, specs still inject") {
    // default (no conf, no target): the production literal holds and
    // the spec corpus stays below it
    assert(TextOps.spanAutoNSeg(skewedDocs, fraction = 1.0) == 1)
    // a deployment-tightened budget via runtime conf engages the
    // degrade on the SAME corpus — no rebuild, no code change
    spark.conf.set(SkewSketch.SpanBudgetKey, "100")
    spark.conf.set(SkewSketch.GraphBudgetKey, "50")
    try {
      assert(TextOps.spanAutoNSeg(skewedDocs, fraction = 1.0) > 1,
        "conf-tightened span budget must engage the degrade")
      import spark.implicits._
      val hubEdges = (0L until 300L).flatMap { c =>
        (0L until 3L).map(hub => (c, hub))
      }.toDF("c", "sk")
      assert(PipelineOps.graphAutoNSeg(hubEdges, fraction = 1.0) > 1,
        "conf-tightened graph budget must engage the hub split")
      // an explicit target still overrides the conf (spec injection)
      assert(TextOps.spanAutoNSeg(skewedDocs, target = 1000000L,
        fraction = 1.0) == 1)
      // a nonsense conf value fails loudly, not silently
      spark.conf.set(SkewSketch.SpanBudgetKey, "0")
      intercept[IllegalArgumentException] {
        TextOps.spanAutoNSeg(skewedDocs, fraction = 1.0)
      }
    } finally {
      spark.conf.unset(SkewSketch.SpanBudgetKey)
      spark.conf.unset(SkewSketch.GraphBudgetKey)
    }
  }

  test("the catalog entries pick nSeg = 1 on the driver fixture (plans pinned)") {
    // the production budgets must NOT trigger on driver-scale data —
    // q136/q143/q154/q110 keep their PlanSpec-pinned shapes and hashes
    assert(TextOps.spanAutoNSeg(TextOps.docs(spark, sfDir)) == 1)
    import spark.implicits._
    val edges = Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_suppkey")
      .join(Tables(spark, sfDir, "orders").select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("c"), $"l_suppkey".as("sk"))
    assert(PipelineOps.graphAutoNSeg(edges) == 1)
  }
}
