package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorOps

/** q171 SemDeDup: driver brute force over the converged clustering
  * (assignment, intra-cell pairs, exact-integer cosine threshold,
  * less-central drop rule) compared row-exact, plus a constructed
  * corpus pinning the semantics — a planted duplicate is caught and
  * the less-central copy dropped, and a cross-CELL duplicate is NOT a
  * candidate (the cluster-bounded recall cut SemDeDup accepts by
  * design).
  */
class SemDedupSpec extends SparkSpec {

  private def d2(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
  private def dot(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("q171 equals a driver brute force over the converged clustering") {
    import spark.implicits._
    val got = VectorOps.defs("q171_semdedup_lloyd")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val emb = VectorOps.quantized(spark, sfDir)
    val seeds = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"qv".as("cq"))
    val (learned, _) = VectorOps.lloydTrain(emb, seeds,
      VectorOps.LloydMaxIters, VectorOps.LloydMinImprove)
    val cents = learned.select($"cid".cast("long"), $"cq")
      .as[(Long, Seq[Long])].collect()
    val vecs = emb.as[(Long, Seq[Long])].collect()
    val assigned = vecs.map { case (id, qv) =>
      val (cid, cq) = cents.minBy { case (c, cq) => (d2(qv, cq), c) }
      (id, cid, d2(qv, cq), dot(qv, qv), qv)
    }
    val pairs = for {
      a <- assigned; b <- assigned
      if a._2 == b._2 && a._1 < b._1
      dd = dot(a._5, b._5)
      if dd > 0 &&
        BigInt(dd) * dd * 25 >= BigInt(a._4) * b._4 * 4
    } yield (a, b)
    val dropIds = pairs.map { case (a, b) =>
      if (a._3 > b._3 || (a._3 == b._3 && a._1 > b._1)) a._1 else b._1
    }.toSet
    val nPairs = pairs.flatMap(p => Seq(p._1._1, p._2._1))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val want = assigned.map { case (id, cid, _, _, _) =>
      (cid, id, nPairs.getOrElse(id, 0L),
        if (dropIds.contains(id)) 1L else 0L)
    }.sortBy(v => (v._1, v._2)).toSeq
    assert(got === want)
    assert(got.exists(_._4 == 1L), "fixture should drop something")
    assert(got.count(_._4 == 1L) < got.length / 2,
      "drops should be the minority at this threshold")
  }

  test("a planted duplicate drops its less-central copy; cross-cell twins are not candidates") {
    import spark.implicits._
    // cell 0: a (close to centroid) and b = 2a (same direction, cos = 1,
    // farther out), plus an orthogonal bystander c; cell 1: d = a's twin
    // but in ANOTHER cell — cluster-bounded candidates must ignore it
    val member = Seq(
      (10L, 0L, 1L, 4L, Seq(2L, 0L, 0L, 0L)),
      (11L, 0L, 9L, 16L, Seq(4L, 0L, 0L, 0L)),
      (12L, 0L, 2L, 25L, Seq(0L, 5L, 0L, 0L)),
      (20L, 1L, 0L, 9L, Seq(3L, 0L, 0L, 0L))
    ).toDF("vec_id", "cid", "dist", "n2", "qv")
    val got = VectorOps.semDedupVerdicts(member)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 10L, 1L, 0L),   // keeper: nearer its centroid
      (0L, 11L, 1L, 1L),   // the less-central duplicate drops
      (0L, 12L, 0L, 0L),   // orthogonal: cosine 0, no pair
      (1L, 20L, 0L, 0L)))  // cross-cell twin: never a candidate
  }
}
