package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Relational, VectorOps}

/** Physical-plan quality gates — the 100 TB design assertions. A query can
  * be value-correct and still carry a plan that dies at scale; these tests
  * pin the plan shapes we designed for (broadcasts actually broadcast,
  * scans prune columns, top-k avoids global sorts, codegen covers the hot
  * path).
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("broadcast joins are BroadcastHashJoin, not shuffled") {
    val p13 = plan(Relational.defs("q13_broadcast_side_join")(spark, sfDir))
    assert(p13.contains("BroadcastHashJoin"), p13.take(800))
    val p17 = plan(Relational.defs("q17_multi_join_revenue")(spark, sfDir))
    assert(p17.contains("BroadcastHashJoin"), "dims must broadcast in q17")
    val p37 = plan(VectorOps.defs("q37_knn_bruteforce")(spark, sfDir))
    assert(p37.contains("BroadcastNestedLoopJoin") || p37.contains("BroadcastHashJoin"),
      "query vectors must broadcast in kNN")
  }

  test("parquet scans prune columns to what the query needs") {
    val df = Relational.defs("q03_join_topk")(spark, sfDir)
    val scans = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("parquet"))
    assert(scans.nonEmpty)
    // orders scan must not read o_orderstatus/o_orderpriority
    val ordersScan = scans.find(_.contains("orders")).get
    assert(!ordersScan.contains("o_orderstatus"),
      s"unpruned orders scan: ${ordersScan.take(400)}")
    assert(!ordersScan.contains("o_orderpriority"))
  }

  test("filters push down to the parquet scan") {
    import spark.implicits._
    val df = Tables(spark, sfDir, "lineitem")
      .filter($"l_quantity" > 45.0)
      .select($"l_orderkey", $"l_quantity")
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .find(_.contains("parquet")).get
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(l_quantity"),
      s"filter not pushed: ${scan.take(400)}")
  }

  test("sort+limit compiles to TakeOrderedAndProject (top-k, no global sort)") {
    val p = plan(Relational.defs("q12_sort_limit")(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("aggregation is two-phase (partial then final)") {
    val p = plan(Relational.defs("q01_pricing_summary")(spark, sfDir))
    assert(p.contains("HashAggregate"), p.take(500))
    // partial + final = at least two HashAggregate nodes
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "expected partial+final aggregate")
  }

  test("the hot relational path stays inside whole-stage codegen") {
    // AQE finalizes the plan only on execution; run it, then inspect.
    val df = Relational.defs("q01_pricing_summary")(spark, sfDir)
    df.collect() // finalizes THIS QueryExecution's adaptive plan
    val p = df.queryExecution.executedPlan.toString
    // codegen'd operators carry the "*(n)" stage prefix in plan strings
    assert(p.contains("*("), p.take(800))
  }

  test("TPC-H plans broadcast dims and push filters into the fact scan") {
    val p3 = plan(graft.operators.TpchFull.defs("tpch_q03")(spark, sfDir))
    assert(p3.contains("PushedFilters: [IsNotNull(c_mktsegment"),
      "segment filter must reach the customer scan")
    val p5 = plan(graft.operators.TpchFull.defs("tpch_q05")(spark, sfDir))
    assert(p5.contains("BroadcastHashJoin"), "nation/region must broadcast")
    assert(p5.contains("PushedFilters: [IsNotNull(o_orderdate"),
      "date range must reach the orders scan")
  }

  test("LSH recheck never forces a broadcast of the corpus-sized sets") {
    // Round 4's one flagged scale hazard: the exact-Jaccard recheck used
    // to carry broadcast() hints on the token-hash-set relation, which
    // grows with the corpus and would hit Spark's broadcast ceiling long
    // before 100 TB. The recheck must compile to shuffle joins whenever
    // the build side exceeds the broadcast threshold — pin that by
    // zeroing the threshold and asserting no BroadcastHashJoin survives
    // in the candidate→sets attach joins.
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      for (q <- Seq("q33_minhash_lsh_pairs", "q61_minhash_md5")) {
        val p = plan(graft.operators.TextOps.defs(q)(spark, sfDir))
        assert(!p.contains("BroadcastHashJoin"),
          s"$q recheck still forces a broadcast:\n${p.take(1200)}")
        assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
          s"$q recheck should shuffle-join the sets:\n${p.take(1200)}")
      }
    }
  }

  private def withSQLConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("rank-k window filters compile to WindowGroupLimit (partial top-k)") {
    // Spark 3.5+ plants WindowGroupLimit below the shuffle for
    // row_number()-filter patterns — per-partition top-k BEFORE the
    // exchange. This is why no custom rank-1 operator/rule is needed
    // (SURVEY §4 conclusion, re-validated on Spark 4.1).
    val p = plan(Relational.defs("q06_rank_per_key")(spark, sfDir))
    assert(p.contains("WindowGroupLimit"), p.take(800))
    assert(p.contains("Partial"), "expected partial (pre-shuffle) group limit")
  }
}
