package graft

import graft.operators.VectorOps

/** q174 embedding drift monitor: the slice/TVD/distortion arithmetic is
  * recomputed by a driver brute force from the converged assignment and
  * compared row-exact, plus the bounds a monitor consumer relies on.
  */
class DriftSpec extends SparkSpec {

  test("q174 equals a driver brute force over the converged assignment") {
    import spark.implicits._
    val got = SparkEntry.queries("q174_embedding_drift")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq

    val emb = VectorOps.quantized(spark, sfDir)
    val seeds = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"qv".as("cq"))
    val (learned, _) = VectorOps.lloydTrain(emb, seeds,
      VectorOps.LloydMaxIters, VectorOps.LloydMinImprove)
    val assigned = VectorOps.argminPacked(emb, learned)
      .select($"vec_id", $"cid", $"dist")
      .as[(Long, Long, Long)].collect().toSeq
    val mx = assigned.map(_._1).max
    val rows = assigned.map { case (id, cid, dist) =>
      (math.min(9L, id * 10 / (mx + 1)), cid, dist)
    }
    val nAll = rows.size.toLong
    val cC = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, rs) =>
      val nS = rs.size.toLong
      val sc = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val num = cC.map { case (cid, nC) =>
        math.abs(sc.getOrElse(cid, 0L) * nAll - nC * nS)
      }.sum
      (s, nS, 500L * num / (nS * nAll), rs.map(_._3).sum / nS)
    }
    assert(got === want)
    assert(got.map(_._1) === (0L to 9L))
    assert(got.map(_._2).sum === nAll)
    assert(got.forall(r => r._3 >= 0L && r._3 <= 1000L))
    assert(got.forall(_._4 >= 0L))
  }
}
