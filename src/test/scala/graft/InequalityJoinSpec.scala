package graft

import org.apache.spark.sql.functions._
import graft.plans.InequalityJoinOp

/** The native IEJoin-style inequality join (custom LogicalPlan +
  * Strategy + SparkPlan) against naive reference computations and
  * Spark's own nested-loop result.
  */
class InequalityJoinSpec extends SparkSpec {

  test("all sixteen op combinations match a naive reference on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val lefts = Seq.fill(150)((rnd.nextInt(40), rnd.nextInt(40), rnd.nextInt(1000)))
    val rights = Seq.fill(60)((rnd.nextInt(40), rnd.nextInt(40), rnd.nextInt(1000)))
    val lDf = lefts.toDF("lx", "ly", "lid")
    val rDf = rights.toDF("rx", "ry", "rid")
    def cmp(op: String): (Int, Int) => Boolean = op match {
      case "<" => _ < _ case "<=" => _ <= _ case ">" => _ > _ case ">=" => _ >= _
    }
    for (ox <- Seq("<", "<=", ">", ">="); oy <- Seq("<", "<=", ">", ">=")) {
      val out = InequalityJoinOp.ieJoin(lDf, rDf, ("lx", ox, "rx"), ("ly", oy, "ry"))
        .select($"lid", $"rid").collect().map(r => (r.getInt(0), r.getInt(1)))
        .sorted.toSeq
      val expected = (for {
        (lx, ly, lid) <- lefts
        (rx, ry, rid) <- rights
        if cmp(ox)(lx, rx) && cmp(oy)(ly, ry)
      } yield (lid, rid)).sorted
      assert(out == expected, s"ops ($ox, $oy): got ${out.size}, want ${expected.size}")
    }
  }

  test("matches Spark's own nested-loop join on timestamps and doubles") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    def ts(sec: Int) = new java.sql.Timestamp(1_500_000_000_000L + sec * 1000L)
    val a = Seq.fill(120)((rnd.nextInt(500), ts(rnd.nextInt(300)), rnd.nextDouble()))
      .zipWithIndex.map { case ((_, t, v), i) => (i, t, v) }
    val b = Seq.fill(80)((rnd.nextInt(500), ts(rnd.nextInt(300)), rnd.nextDouble()))
      .zipWithIndex.map { case ((_, t, v), i) => (i, t, v) }
    val aDf = a.toDF("id1", "t1", "v1")
    val bDf = b.toDF("id2", "t2", "v2")
    val native = InequalityJoinOp.ieJoin(aDf, bDf, ("t1", "<", "t2"), ("v1", ">", "v2"))
      .select($"id1", $"id2").collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    val builtin = aDf.join(bDf, $"t1" < $"t2" && $"v1" > $"v2")
      .select($"id1", $"id2").collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    assert(native == builtin && native.nonEmpty)
  }

  test("null predicate values never match on either side") {
    import spark.implicits._
    val l = Seq((Some(1), Some(10), 1), (None, Some(10), 2), (Some(1), None, 3))
      .toDF("lx", "ly", "lid")
    val r = Seq((Some(5), Some(5), 1), (None, Some(0), 2), (Some(9), None, 3))
      .toDF("rx", "ry", "rid")
    val out = InequalityJoinOp.ieJoin(l, r, ("lx", "<", "rx"), ("ly", ">", "ry"))
      .select($"lid", $"rid").collect().map(x => (x.getInt(0), x.getInt(1))).toSet
    assert(out == Set((1, 1)))
  }

  test("plan is the custom exec, not a nested-loop or cartesian join") {
    import spark.implicits._
    val l = Seq((1, 2, 3)).toDF("lx", "ly", "lid")
    val r = Seq((4, 0, 9)).toDF("rx", "ry", "rid")
    val df = InequalityJoinOp.ieJoin(l, r, ("lx", "<", "rx"), ("ly", ">", "ry"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("InequalityJoin"), p.take(500))
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("Cartesian"), p.take(500))
    assert(df.collect().map(x => (x.getInt(2), x.getInt(5))).toSeq == Seq((3, 9)))
  }

  test("optimizer rule rewrites a plain two-inequality join, SQL included") {
    import spark.implicits._
    import graft.plans.{InequalityJoinRewrite, InequalityJoinStrategy}
    val savedOpt = spark.experimental.extraOptimizations
    val savedStrat = spark.experimental.extraStrategies
    spark.experimental.extraOptimizations = savedOpt :+ InequalityJoinRewrite
    if (!savedStrat.contains(InequalityJoinStrategy))
      spark.experimental.extraStrategies = savedStrat :+ InequalityJoinStrategy
    try {
      val rnd = new scala.util.Random(13)
      val big = Seq.fill(300)((rnd.nextInt(50), rnd.nextInt(50), rnd.nextInt(999)))
        .toDF("lx", "ly", "lid")
      val dim = Seq.fill(40)((rnd.nextInt(50), rnd.nextInt(50), rnd.nextInt(999)))
        .toDF("rx", "ry", "rid")
      // plain Dataset API join — no explicit InequalityJoinOp call
      val joined = big.join(dim, $"lx" < $"rx" && $"ly" > $"ry")
      assert(joined.queryExecution.executedPlan.toString.contains("InequalityJoin"),
        joined.queryExecution.executedPlan.toString.take(500))
      // SQL text takes the same path
      big.createOrReplaceTempView("ineq_l")
      dim.createOrReplaceTempView("ineq_r")
      val viaSql = spark.sql(
        "SELECT lid, rid FROM ineq_l JOIN ineq_r ON lx < rx AND ly > ry")
      assert(viaSql.queryExecution.executedPlan.toString.contains("InequalityJoin"))
      // and the rewritten result matches the un-rewritten BNLJ result
      spark.experimental.extraOptimizations = savedOpt
      val expected = big.join(dim, $"lx" < $"rx" && $"ly" > $"ry")
        .select($"lid", $"rid").collect().map(r => (r.getInt(0), r.getInt(1)))
        .sorted.toSeq
      spark.experimental.extraOptimizations = savedOpt :+ InequalityJoinRewrite
      val got = viaSql.collect().map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
      assert(got == expected && got.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations = savedOpt
      spark.experimental.extraStrategies = savedStrat
    }
  }

  test("rule leaves equi and oversized joins alone") {
    import spark.implicits._
    import graft.plans.{InequalityJoinRewrite, InequalityJoinStrategy}
    val savedOpt = spark.experimental.extraOptimizations
    val savedStrat = spark.experimental.extraStrategies
    spark.experimental.extraOptimizations = savedOpt :+ InequalityJoinRewrite
    if (!savedStrat.contains(InequalityJoinStrategy))
      spark.experimental.extraStrategies = savedStrat :+ InequalityJoinStrategy
    try {
      val a = Seq((1, 2, 3)).toDF("lx", "ly", "lid")
      val b = Seq((1, 2, 3)).toDF("rx", "ry", "rid")
      // an equi predicate present: hash join territory, no rewrite
      val equi = a.join(b, $"lx" === $"rx" && $"ly" > $"ry")
      assert(!equi.queryExecution.executedPlan.toString.contains("InequalityJoin"))
      // three conjuncts: outside the rule's exact-two shape
      val three = a.join(b, $"lx" < $"rx" && $"ly" > $"ry" && $"lid" =!= $"rid")
      assert(!three.queryExecution.executedPlan.toString.contains("InequalityJoin"))
    } finally {
      spark.experimental.extraOptimizations = savedOpt
      spark.experimental.extraStrategies = savedStrat
    }
  }

  test("empty sides produce empty output") {
    import spark.implicits._
    val l = Seq((1, 2, 3)).toDF("lx", "ly", "lid")
    val empty = Seq.empty[(Int, Int, Int)].toDF("rx", "ry", "rid")
    assert(InequalityJoinOp.ieJoin(l, empty, ("lx", "<", "rx"), ("ly", ">", "ry"))
      .collect().isEmpty)
    assert(InequalityJoinOp.ieJoin(empty.toDF("lx", "ly", "lid"), l.toDF("rx", "ry", "rid"),
      ("lx", "<", "rx"), ("ly", ">", "ry")).collect().isEmpty)
  }
}
