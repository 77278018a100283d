package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, VectorOps}

/** mergeFrom / q175: the merged store's contents equal the destination's
  * natives plus the source's LIVE rows re-homed to the destination's
  * cells (driver brute force), the source is untouched, a merge replay
  * is a no-op, and PQ stores refuse to merge.
  */
class IndexMergeSpec extends SparkSpec {

  private def d2(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private def tmp(n: String) = java.nio.file.Files
    .createTempDirectory(n).toString + "/ix"

  test("merge moves exactly the source's live rows, re-homed to dst cells") {
    import spark.implicits._
    val emb = VectorOps.quantized(spark, sfDir)
    val (dirA, dirB) = (tmp("graft_mergeA"), tmp("graft_mergeB"))
    IvfIndex.build(emb.filter($"vec_id" % 2 === 0), dirA)
    IvfIndex.build(emb.filter($"vec_id" % 2 === 1), dirB)
    IvfIndex.delete(spark, dirB,
      emb.filter($"vec_id" % 2 === 1 && $"vec_id" % 7 === 0)
        .select($"vec_id"))
    val preB = IvfIndex.liveContents(spark, dirB)
      .as[(Long, Long)].collect().toSet
    IvfIndex.mergeFrom(spark, dirA, dirB, gen = 1L)
    val got = IvfIndex.liveContents(spark, dirA).as[(Long, Long)].collect()
      .toSeq.sorted

    // driver replay: A's natives keep their homes; B's live rows re-home
    // to their nearest A-centroid
    val cents = IvfIndex.centroids(spark, dirA)
      .select($"cid".cast("long"), $"cq").as[(Long, Seq[Long])].collect()
    val vecs = emb.as[(Long, Seq[Long])].collect().toMap
    // both populations home by the same rule — nearest A-centroid
    // (A's build postings ARE the converged argmin; B's rows re-assign
    // against the same table on merge)
    val wantIds = vecs.keys.filter(id =>
      id % 2 == 0 || id % 7 != 0).toSeq.sorted
    val want = wantIds.map { id =>
      (id, cents.minBy { case (c, cq) => (d2(vecs(id), cq), c) }._1)
    }
    assert(got === want)
    assert(got.map(_._1).toSet.intersect(
      vecs.keys.filter(id => id % 2 == 1 && id % 7 == 0).toSet).isEmpty,
      "source tombstones must not resurrect")
    // source untouched; replay of the same generation is a no-op
    assert(IvfIndex.liveContents(spark, dirB)
      .as[(Long, Long)].collect().toSet === preB)
    IvfIndex.mergeFrom(spark, dirA, dirB, gen = 1L)
    assert(IvfIndex.liveContents(spark, dirA).as[(Long, Long)].collect()
      .toSeq.sorted === got)
  }

  test("PQ stores refuse to merge in either role") {
    import spark.implicits._
    val emb = VectorOps.quantized(spark, sfDir)
    val (dirP, dirR) = (tmp("graft_mergeP"), tmp("graft_mergeR"))
    IvfIndex.buildPq(emb.filter($"vec_id" % 2 === 0), dirP)
    IvfIndex.build(emb.filter($"vec_id" % 2 === 1), dirR)
    intercept[IllegalArgumentException] {
      IvfIndex.mergeFrom(spark, dirR, dirP, gen = 1L)
    }
    intercept[IllegalArgumentException] {
      IvfIndex.mergeFrom(spark, dirP, dirR, gen = 1L)
    }
  }
}
