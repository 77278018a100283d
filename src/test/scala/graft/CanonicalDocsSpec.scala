package graft

/** q170 canonical election: a driver-side union-find over the same
  * banded pair relation plus the longest-member election, compared
  * row-exact; plus the verdict invariants (exactly one keeper per
  * cluster, the keeper maximizes (n_tok, -doc_id), members == all
  * edge endpoints).
  */
class CanonicalDocsSpec extends SparkSpec {

  test("q170 equals a driver union-find + election brute force") {
    import spark.implicits._
    val pairs = operators.TextOps.md5LshScoredPairs(spark, sfDir)
      .select($"id1", $"id2").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture produced no near-dup pairs")
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.foreach { case (a, b) => union(a, b) }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val nTok = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> Option(t).getOrElse("").split("\\s+", -1).length.toLong
      }.toMap
    // path-compress everything so reps are final minima
    members.foreach(find)
    val want = members.groupBy(find).toSeq.flatMap { case (rep, ms) =>
      val keeper = ms.maxBy(m => (nTok(m), -m))
      ms.map(m => (rep, m, nTok(m), if (m == keeper) 1L else 0L))
    }.sortBy(v => (v._1, v._2))
    val got = operators.PipelineOps.defs("q170_canonical_docs")(spark, sfDir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want)
    // invariants: one keeper per cluster; purge count = members - clusters
    val byRep = got.groupBy(_._1)
    byRep.values.foreach(ms => assert(ms.count(_._4 == 1L) === 1))
    assert(got.count(_._4 == 0L) === members.length - byRep.size)
  }
}
