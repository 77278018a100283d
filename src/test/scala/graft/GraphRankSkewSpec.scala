package graft

import org.apache.spark.sql.functions._
import graft.operators.PipelineOps

/** q110's hub-skew degrade path: salt-split adjacency (`nSeg > 1`) must
  * (a) bound every segment row well below the hub's degree, and (b) leave
  * the propagation result byte-identical to the single-row plan — the
  * all-int64 FLOOR arithmetic divides by the TOTAL degree on every
  * exploded edge, so per-key sums cannot depend on how the list is split.
  */
class GraphRankSkewSpec extends SparkSpec {

  // a web-graph-shaped bipartite graph: one hub customer touching every
  // supplier, one hub supplier touched by every customer, sparse tail
  private def skewedEdges = {
    import spark.implicits._
    val hubC = (1L to 2000L).map(sk => (0L, sk))
    val hubS = (1L to 500L).map(c => (c, 0L))
    val tail = for { c <- 1L to 500L; j <- 0L until 4L }
      yield (c, (c * 7 + j * 131) % 2000 + 1)
    (hubC ++ hubS ++ tail).toDF("c", "sk")
  }

  test("salted adjacency bounds segment rows and preserves total degree") {
    import spark.implicits._
    val adj = PipelineOps.adjacency(skewedEdges, "c", "sk", 8)
    val hub = adj.filter($"c" === 0L)
      .select(size($"nbrs"), $"deg").as[(Int, Long)].collect()
    assert(hub.nonEmpty && hub.forall(_._2 == 2000L),
      "every segment row must carry the hub's TOTAL degree")
    assert(hub.map(_._1.toLong).sum == 2000L,
      "segments must partition the neighbor list")
    assert(hub.map(_._1).max < 600,
      s"no segment may hold the whole hub list: ${hub.map(_._1).toSeq}")
    // duplicate edges still dedup segment-locally (same nbr → same salt)
    val dup = PipelineOps.adjacency(
      skewedEdges.union(skewedEdges), "c", "sk", 8)
    assert(dup.agg(sum(size($"nbrs"))).as[Long].head ==
      adj.agg(sum(size($"nbrs"))).as[Long].head)
  }

  test("graphRank is invariant to the segmentation (nSeg 1 vs 8)") {
    import spark.implicits._
    def ranked(nSeg: Int) =
      PipelineOps.graphRank(skewedEdges, nSeg)
        .orderBy($"s_suppkey")
        .as[(Long, Long, Long, Long)].collect().toSeq
    val plain = ranked(1)
    assert(plain.nonEmpty)
    assert(ranked(8) == plain,
      "salt-split propagation must be byte-identical to the 1-row plan")
  }
}
