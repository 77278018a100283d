package graft

/** q169 damped PageRank: an independent driver-side Scala replication
  * of the full loop — graph build, integer propagation rounds, the L1
  * deltas, and the relative-residual stop decision — compared
  * row-exact; plus the contraction property the stop rule relies on
  * (each round's delta strictly below its predecessor's).
  */
class PageRankSpec extends SparkSpec {

  test("q169 equals a driver-side replay of rounds and stop decision") {
    import spark.implicits._
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_orderkey", $"l_suppkey")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderkey", $"o_custkey")
    val edges = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".cast("long").as("c"),
        $"l_suppkey".cast("long").as("sk"))
      .distinct().as[(Long, Long)].collect()
    val e2 = edges.map { case (c, sk) => (c * 2, sk * 2 + 1) } ++
      edges.map { case (c, sk) => (sk * 2 + 1, c * 2) }
    val out: Map[Long, Seq[Long]] =
      e2.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSeq }
    val deg = out.map { case (u, vs) => u -> vs.size.toLong }
    val nodes = out.keys.toSeq.sorted
    val s0 = 1000000000000L / nodes.size
    val tele = 15L * s0 / 100L
    var mass = nodes.map(_ -> s0).toMap
    var iters = 0
    var first = 0L
    var done = false
    val deltas = scala.collection.mutable.ArrayBuffer[Long]()
    while (!done && iters < 8) {
      val in = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      nodes.foreach { u =>
        val w = 85L * mass(u) / (100L * deg(u))
        out(u).foreach(v => in(v) += w)
      }
      val next = nodes.map(u => u -> (tele + in(u))).toMap
      val delta = nodes.map(u => math.abs(next(u) - mass(u))).sum
      deltas += delta
      iters += 1
      mass = next
      if (iters == 1) first = delta
      done = delta * 2L < first
    }
    // contraction: the residual shrinks every round
    deltas.toSeq.sliding(2).foreach { w =>
      if (w.size == 2) assert(w(1) < w(0), "residual must contract")
    }
    val want = nodes.map(u => (u, u % 2, deg(u), mass(u), iters.toLong))
      .sortBy { case (u, _, _, m, _) => (-m, u) }.take(20)
    val got = operators.PipelineOps.defs("q169_pagerank")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
    assert(iters < 8, "fixture must exercise the stop below the cap")
  }
}
