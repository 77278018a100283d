package graft

/** q170's election must stay an ARGMAX AGGREGATE: a row_number window
  * partitioned by cluster rep puts a boilerplate mega-cluster in ONE
  * task — and because every member is retained as a verdict row,
  * WindowGroupLimit cannot prune that shape. max_by partial-aggregates
  * map-side (one row per cluster leaves each task) and the keeper
  * join-back is a streaming probe AQE can skew-split. Constructed
  * mega-cluster + plan pin.
  */
class CanonicalSkewSpec extends SparkSpec {

  test("election on a constructed mega-cluster: aggregated plan, no window, driver-equal") {
    import spark.implicits._
    // one 20k-member boilerplate cluster beside 50 two-member clusters
    val mega = (0L until 20000L).map(i => (7L, 1000L + i, i % 97))
    val smalls = (0L until 50L).flatMap(j =>
      Seq((100000L + j * 10, 100000L + j * 10, 50L + j),
        (100000L + j * 10, 100001L + j * 10, 60L + j)))
    val member = (mega ++ smalls).toDF("rep", "id", "n_tok")
    val got = operators.PipelineOps.electCanonical(member)
    val rows = got.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val want = (mega ++ smalls).groupBy(_._1).toSeq.flatMap { case (rep, ms) =>
      val keeper = ms.maxBy(m => (m._3, -m._2))._2
      ms.map(m => (rep, m._2, m._3, if (m._2 == keeper) 1L else 0L))
    }.sortBy(v => (v._1, v._2))
    assert(rows === want)
    // exactly one keeper everywhere, including the mega-cluster
    assert(rows.filter(_._1 == 7L).count(_._4 == 1L) === 1)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"the election must not use a window:\n${plan.take(1500)}")
    assert(plan.toLowerCase.contains("max_by"),
      s"expected a max_by aggregate:\n${plan.take(1500)}")
  }
}
