package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, VectorOps}

/** [[IvfIndex.cloneAt]]: a clone must be the epoch's exact logical
  * state (serve bit-equal to serveAt, raw and PQ), a FULL PEER
  * (independently mutable, without feedback into the source), and
  * INDEPENDENT of the source's files (still serving after the source
  * compacts, GCs under the narrow window, and vacuums). Also pins the
  * guards: same-dir clone refused, out-of-window epoch refused.
  */
class CloneStoreSpec extends SparkSpec {

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_clone_spec/$name"

  private type Served = Set[(Long, Long, Long, Long, Long)]
  private def rows(df: org.apache.spark.sql.DataFrame): Served = {
    import spark.implicits._
    df.select("query_id", "rank", "neighbor", "dist", "cell_size")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
  }

  test("clone serves the epoch bit-identically and survives source GC") {
    import spark.implicits._
    spark.conf.set("spark.graft.index.retainEpochs", "8")
    try {
      val emb = VectorOps.quantized(spark, sfDir)
      val queries = emb.filter($"vec_id" % 100 === 0)
      val src = tmp("src")
      val dst = tmp("dst")
      IvfIndex.build(emb.filter($"vec_id" % 5 =!= 0), src)     // epoch 1
      IvfIndex.addBatch(spark, src, emb.filter($"vec_id" % 5 === 0)) // 2
      IvfIndex.delete(spark, src,
        emb.filter($"vec_id" % 7 === 0).select($"vec_id"))     // epoch 3
      val at2 = rows(IvfIndex.serveAt(spark, src, 2L, queries))
      IvfIndex.cloneAt(spark, src, 2L, dst)
      assert(rows(IvfIndex.serve(spark, dst, queries)) === at2)
      // the clone pre-dates the delete: it must surface deleted ids
      assert(rows(IvfIndex.serve(spark, dst, queries))
        .exists { case (_, _, n, _, _) => n % 7 == 0 })
      // clone of the post-delete epoch applies the mask PHYSICALLY
      val dst3 = tmp("dst3")
      val at3 = rows(IvfIndex.serveAt(spark, src, 3L, queries))
      IvfIndex.cloneAt(spark, src, 3L, dst3)
      assert(rows(IvfIndex.serve(spark, dst3, queries)) === at3)
      assert(!rows(IvfIndex.serve(spark, dst3, queries))
        .exists { case (_, _, n, _, _) => n % 7 == 0 })
      // independence: narrow the window, mutate + GC + vacuum the source
      spark.conf.set("spark.graft.index.retainEpochs", "1")
      IvfIndex.compact(spark, src)
      IvfIndex.vacuum(spark, src)
      assert(rows(IvfIndex.serve(spark, dst, queries)) === at2,
        "clone must not share files with the source")
      // full peer: mutate the CLONE; the source's serve is unaffected
      val srcBefore = rows(IvfIndex.serve(spark, src, queries))
      IvfIndex.delete(spark, dst,
        emb.filter($"vec_id" % 3 === 0).select($"vec_id"))
      IvfIndex.compact(spark, dst)
      assert(!rows(IvfIndex.serve(spark, dst, queries))
        .exists { case (_, _, n, _, _) => n % 3 == 0 })
      assert(rows(IvfIndex.serve(spark, src, queries)) === srcBefore,
        "mutating the clone must not feed back into the source")
    } finally spark.conf.unset("spark.graft.index.retainEpochs")
  }

  test("PQ store clone serves bit-identically (codebook version carried)") {
    import spark.implicits._
    spark.conf.set("spark.graft.index.retainEpochs", "8")
    try {
      val emb = VectorOps.quantized(spark, sfDir)
      val queries = emb.filter($"vec_id" % 100 === 0)
      val src = tmp("pqsrc")
      val dst = tmp("pqdst")
      IvfIndex.buildPq(emb.filter($"vec_id" % 5 =!= 0), src)
      IvfIndex.addBatchPq(spark, src, emb.filter($"vec_id" % 5 === 0))
      val at2 = IvfIndex.servePqAt(spark, src, 2L, queries).collect()
        .map(_.toSeq).toSet
      IvfIndex.cloneAt(spark, src, 2L, dst)
      val got = IvfIndex.servePq(spark, dst, queries).collect()
        .map(_.toSeq).toSet
      assert(got === at2)
    } finally spark.conf.unset("spark.graft.index.retainEpochs")
  }

  test("labeled store clone carries the (cid,label,gen) layout") {
    import spark.implicits._
    spark.conf.set("spark.graft.index.retainEpochs", "8")
    try {
      val emb = VectorOps.quantizedLabeled(spark, sfDir)
      val queries = emb.filter($"vec_id" % 100 === 0)
      val src = tmp("labsrc")
      val dst = tmp("labdst")
      IvfIndex.buildLabeled(emb, src)
      IvfIndex.delete(spark, src,
        emb.filter($"vec_id" % 7 === 0).select($"vec_id")) // epoch 2
      val at1 = IvfIndex.serveLabeled(spark, src, queries).collect()
        .map(_.toSeq).toSet
      IvfIndex.cloneAt(spark, src, 2L, dst)
      val got = IvfIndex.serveLabeled(spark, dst, queries).collect()
        .map(_.toSeq).toSet
      assert(got === at1)
      // the label partition level survived: the filtered serve still
      // prunes, and no vector lost its label on the rewrite
      val lab = IvfIndex.postings(spark, dst)
      assert(lab.columns.contains("label"))
      val want = emb.filter($"vec_id" % 7 =!= 0)
        .select($"vec_id", $"label").as[(Long, Long)].collect().toSet
      assert(lab.select($"vec_id", $"label".cast("long"))
        .as[(Long, Long)].collect().toSet === want)
    } finally spark.conf.unset("spark.graft.index.retainEpochs")
  }

  test("guards: same directory and out-of-window epochs are refused") {
    import spark.implicits._
    spark.conf.set("spark.graft.index.retainEpochs", "1")
    try {
      val emb = VectorOps.quantized(spark, sfDir)
      val src = tmp("guard")
      IvfIndex.build(emb.filter($"vec_id" % 5 =!= 0), src)     // epoch 1
      IvfIndex.addBatch(spark, src, emb.filter($"vec_id" % 5 === 0)) // 2
      intercept[IllegalArgumentException] {
        IvfIndex.cloneAt(spark, src, 2L, src)
      }
      // epoch 1 is outside the retainEpochs=1 window
      intercept[IllegalArgumentException] {
        IvfIndex.cloneAt(spark, src, 1L, tmp("guard_dst"))
      }
    } finally spark.conf.unset("spark.graft.index.retainEpochs")
  }
}
