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

  test("q136 stays join-free and broadcast-free (one scan, window form)") {
    // The relational attach form either statically broadcast a
    // corpus-growing aggregate or double-scanned the corpus (round-7
    // finding); the shipped form is one scan + a COUNT window over the
    // hash partition. Pin: no join of any kind, no BroadcastExchange,
    // exactly one parquet scan of documents.
    val df = graft.operators.TextOps.defs("q136_dup_span_coverage")(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("Join"), s"q136 must not join:\n${p.take(800)}")
    assert(!p.contains("BroadcastExchange"),
      s"q136 must not broadcast:\n${p.take(800)}")
    val scans = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).count(_.contains("documents"))
    assert(scans == 1, s"q136 must scan documents once, found $scans")
  }

  test("q137 explodes positions once; q138 twice with a tiny model exchange") {
    // q137's consumers all reference a byte-identical copy of the
    // pair-counts subtree; one pushed-down or join-inferred filter
    // silently splits the subtrees and each consumer re-scans +
    // re-explodes the corpus (the naive form's 3-4 tokenize passes).
    // q138's chosen shape is 2 scans: the model side folds to model
    // cardinality MAP-SIDE (partial agg before its exchange), and the
    // scoring join runs on raw positions so AQE may broadcast the
    // model (no position shuffle at all at this scale) or degrade to
    // one co-partitioned shuffle past broadcast range. AQE applies
    // reuse at stage materialization, so run the query, then pin the
    // final plan.
    def finalPlan(q: String, m: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame]) = {
      val df = m(q)(spark, sfDir)
      df.collect()
      // executedPlan.toString appends the pre-AQE "Initial Plan" (where
      // reuse has not happened yet) — count only the final section
      plan(df).split("== Initial Plan ==")(0)
    }
    val p137 = finalPlan("q137_colloc_pairs", graft.operators.TextOps.defs)
    val gens137 = p137.linesIterator.count(_.contains("Generate explode"))
    assert(gens137 == 1, s"q137 must explode positions once, found $gens137")
    assert(p137.contains("ReusedExchange"), s"q137 lost exchange reuse:\n${p137.take(1200)}")
    val p138 = finalPlan("q138_bigram_surprisal", graft.operators.TextOps.defs)
    val gens138 = p138.linesIterator.count(_.contains("Generate explode"))
    assert(gens138 == 2, s"q138 must explode positions exactly twice, found $gens138")
  }

  test("q142 mines in one bounded-state pass (no candidate window)") {
    // The assignment argmax is a map-side-combined max_by and the
    // mining is one groupBy with the bounded top-k aggregator — the
    // only Window left is over the 1%-sampled query probes. A second
    // Window (or a rank filter) would mean the candidate relation is
    // being shuffled and sorted again (idle sf10 A/B: 6.0 -> 4.8 s,
    // and the candidate shuffle the window form pays is unbounded).
    val df = graft.operators.VectorOps.defs("q142_hard_negatives")(spark, sfDir)
    df.collect()
    val p = plan(df).split("== Initial Plan ==")(0)
    assert(p.linesIterator.count(_.contains("Window [")) == 1,
      s"q142 must window only the query probes:\n${p.take(1200)}")
    assert(p.contains("ktopscored"), "q142 must mine via the bounded top-k aggregator")
    assert(p.contains("max_by"), "q142 assignment must be the max_by argmax")
  }

  test("q139/q142 broadcast only the small-by-construction sides") {
    // q139: the eval digest (benchmark suite) broadcasts; the train
    // corpus must not appear under a BroadcastExchange. With the
    // thresholds zeroed, the only broadcasts left are the EXPLICIT
    // hints (eval grams + per-eval sizes) — never the train side.
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val p139 = plan(graft.operators.PipelineOps
        .defs("q139_containment_decontam")(spark, sfDir))
      val n139 = "BroadcastExchange".r.findAllIn(p139).length
      assert(n139 == 2,
        s"q139 must broadcast exactly eval grams + eval sizes, got $n139")
      // q142: centroids (16 rows) and query probes broadcast; the
      // assigned corpus side must never sit under a BroadcastExchange.
      // Exact node counts vary with subtree duplication (cand feeds both
      // pos and neg), so pin the property: EVERY broadcast subtree is
      // the vec_id<16 centroid slice or the vec_id%100=0 query slice.
      val p142 = plan(graft.operators.VectorOps
        .defs("q142_hard_negatives")(spark, sfDir))
      // subtree extraction by plan-string indentation (collect on the
      // AQE root sees only itself, so walk the printed tree instead)
      val lines = p142.linesIterator.toVector
      def ind(l: String): Int = l.length - l.dropWhile(c =>
        c == ' ' || c == ':' || c == '+' || c == '-').length
      val marks = lines.zipWithIndex.filter(_._1.contains("BroadcastExchange"))
      assert(marks.nonEmpty, s"q142 must broadcast:\n${p142.take(600)}")
      marks.foreach { case (l, i) =>
        val here = ind(l)
        val sub = (l +: lines.drop(i + 1).takeWhile(x =>
          x.trim.isEmpty || ind(x) > here)).mkString("\n")
        assert(sub.contains("LessThan(vec_id,16)") || sub.contains("% 100)"),
          s"q142 broadcasts a corpus-sized subtree:\n${sub.take(600)}")
      }
    }
  }

  test("q135 bounds the per-language exchange with a partial group limit") {
    // Round-7 verdict flag: the cumsum window used to sort each
    // language's ENTIRE document set on one task (skewed-key
    // scale-killer at 100 TB with a dominant language). The shipped form
    // pre-prunes with row_number() <= budget over the same window spec
    // (valid because n_tok >= 1, so rank > budget implies cum > budget),
    // which compiles to WindowGroupLimit: map tasks keep at most
    // `budget` rows per language BELOW the exchange, and the cumsum sort
    // above it touches at most `budget` rows per language.
    val df = graft.operators.PipelineOps.defs("q135_token_budget")(spark, sfDir)
    val p = plan(df)
    assert(p.contains("WindowGroupLimit"), p.take(1200))
    assert(p.contains("Partial"), "expected partial (pre-shuffle) group limit")
    // one lang hash exchange feeds group-limit, both windows, and the
    // rollup — no second corpus-touching exchange appears
    val n = p.sliding("Exchange hashpartitioning(lang".length)
      .count(_ == "Exchange hashpartitioning(lang")
    assert(n == 1, s"expected exactly one lang exchange, found $n:\n${p.take(1200)}")
  }

  test("q150 bounds the rank window and shares one (source, tok) exchange") {
    // rk <= 256 must compile to WindowGroupLimit (no source's full
    // vocabulary sorts on one task), and the profile + totals branches
    // must reuse ONE (source, tok) count exchange — tok is a group key
    // in both, so pruning cannot fork the subtrees.
    val df = graft.operators.TextOps.defs("q150_zipf_profile")(spark, sfDir)
    val p = plan(df)
    assert(p.contains("WindowGroupLimit"), p.take(1200))
    df.collect()
    val fin = plan(df).split("== Initial Plan ==")(0)
    assert(fin.contains("ReusedExchange"),
      s"q150 must share the count exchange:\n${fin.take(1200)}")
  }

  test("q204/q205 reports assemble driver-side off checkpointed stages") {
    // Both entries do ALL corpus work at construction time (sampled
    // banded joins + exact verify for q204; the five training rounds'
    // vocab-bounded aggregates for q205), materialized through
    // checkpoints/collects — the emitted report must therefore plan to
    // a LocalTableScan with NO parquet scan left at action time. A
    // parquet scan here would mean a corpus pass re-runs per action.
    for (q <- Seq("q204_lsh_sampled_ceiling", "q205_doremi_weights")) {
      val p = plan(SparkEntry.queries(q)(spark, sfDir))
      assert(p.contains("LocalTableScan"), s"$q:\n${p.take(400)}")
      assert(!p.contains("Scan parquet"),
        s"$q re-scans the corpus at action time:\n${p.take(800)}")
    }
  }

  test("q206/q210 admission: one source cumsum window, weights broadcast") {
    // The DoReMi admission (q206 on the raw corpus, q210 on the chain
    // survivors) must cost ONE source-keyed exchange feeding the
    // cumsum window — the per-source admitted rollup reuses that
    // partitioning (no second corpus exchange) — and the learned
    // weight table must arrive as a broadcast LocalTableScan, never a
    // shuffled join side.
    val p206 = plan(graft.operators.TextOps
      .defs("q206_doremi_mixture")(spark, sfDir))
    assert(p206.linesIterator.count(_.contains("Window ")) >= 1)
    // of the source-keyed exchanges, exactly ONE may touch the corpus
    // (the cumsum window's); any other is the |sources|-row weight
    // table's side of the report outer join
    val l206 = p206.linesIterator.toVector
    def ind206(l: String): Int = l.length - l.dropWhile(c =>
      c == ' ' || c == ':' || c == '+' || c == '-').length
    val corpusEx = l206.zipWithIndex
      .filter(_._1.contains("Exchange hashpartitioning(source"))
      .count { case (l, i) =>
        val here = ind206(l)
        (l +: l206.drop(i + 1).takeWhile(x =>
          x.trim.isEmpty || ind206(x) > here))
          .exists(_.contains("Scan parquet"))
      }
    assert(corpusEx == 1,
      s"q206 must shuffle the corpus on source exactly once, found $corpusEx:\n${p206.take(1200)}")
    val p210 = plan(graft.operators.PipelineOps
      .defs("q210_doremi_release")(spark, sfDir))
    // the chain head is checkpointed: the only parquet read left is
    // the raw per-source input rollup; admission + survivor rollups
    // ride Scan ExistingRDD
    val scans210 = p210.linesIterator.count(_.contains("Scan parquet"))
    assert(scans210 == 1,
      s"q210 must read documents once at action time, found $scans210")
    assert(p210.linesIterator.count(_.contains("Window ")) == 1,
      "q210 must window only the admission cumsum")
    // every broadcast subtree is the |sources|-row weight table
    val lines = p210.linesIterator.toVector
    def ind(l: String): Int = l.length - l.dropWhile(c =>
      c == ' ' || c == ':' || c == '+' || c == '-').length
    val marks = lines.zipWithIndex.filter(_._1.contains("BroadcastExchange"))
    assert(marks.nonEmpty)
    marks.foreach { case (l, i) =>
      val here = ind(l)
      val sub = (l +: lines.drop(i + 1).takeWhile(x =>
        x.trim.isEmpty || ind(x) > here)).mkString("\n")
      assert(sub.contains("LocalTableScan"),
        s"q210 broadcasts a non-driver-sized subtree:\n${sub.take(400)}")
    }
  }

  test("q191 width table: rank re-ranks bound via WindowGroupLimit, no rescan") {
    // Round-13 form: ONE 100-deep Hamming scan (checkpointed at entry
    // construction — it must NOT appear in the action-time plan as a
    // topscored aggregate or a codes-relation rescan); widths derive
    // by rank filters whose row_number <= 5 compiles to
    // WindowGroupLimit — partial top-5 per task before the width
    // window's exchange.
    val p = plan(VectorOps.defs("q191_binary_sign_ann")(spark, sfDir))
    assert(p.contains("WindowGroupLimit"), p.take(800))
    assert(!p.contains("topscored"),
      "q191's Hamming scan must be checkpointed, not re-planned")
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
