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
    // source untouched
    assert(IvfIndex.liveContents(spark, dirB)
      .as[(Long, Long)].collect().toSet === preB)
    // a reused generation id fails LOUDLY by default — a second source
    // merged under gen 1 would be silently dropped, indistinguishable
    // from success
    val collision = intercept[IllegalArgumentException] {
      IvfIndex.mergeFrom(spark, dirA, dirB, gen = 1L)
    }
    assert(collision.getMessage.contains("already committed"))
    // an EXPLICIT recovery replay of the same source is a no-op
    IvfIndex.mergeFrom(spark, dirA, dirB, gen = 1L, allowReplay = true)
    assert(IvfIndex.liveContents(spark, dirA).as[(Long, Long)].collect()
      .toSeq.sorted === got)
  }

  test("labeled stores refuse to merge in either role") {
    import spark.implicits._
    val emb = VectorOps.quantized(spark, sfDir)
    val labeled = emb.withColumn("label", col("vec_id") % 4)
    val (dirL, dirR) = (tmp("graft_mergeL"), tmp("graft_mergeR2"))
    IvfIndex.buildLabeled(labeled.filter($"vec_id" % 2 === 0), dirL)
    IvfIndex.build(emb.filter($"vec_id" % 2 === 1), dirR)
    val asSrc = intercept[IllegalArgumentException] {
      IvfIndex.mergeFrom(spark, dirR, dirL, gen = 1L)
    }
    assert(asSrc.getMessage.contains("LABELED"))
    val asDst = intercept[IllegalArgumentException] {
      IvfIndex.mergeFrom(spark, dirL, dirR, gen = 1L)
    }
    assert(asDst.getMessage.contains("LABELED"))
  }

  test("labeled merge moves live rows with labels intact, re-homed to dst cells") {
    import spark.implicits._
    val emb = VectorOps.quantized(spark, sfDir)
      .withColumn("label", col("vec_id") % 4)
    val (dirA, dirB) = (tmp("graft_lmA"), tmp("graft_lmB"))
    IvfIndex.buildLabeled(emb.filter($"vec_id" % 2 === 0), dirA)
    IvfIndex.buildLabeled(emb.filter($"vec_id" % 2 === 1), dirB)
    IvfIndex.delete(spark, dirB,
      emb.filter($"vec_id" % 2 === 1 && $"vec_id" % 7 === 0)
        .select($"vec_id"))
    IvfIndex.mergeFromLabeled(spark, dirA, dirB, gen = 1L)
    val got = IvfIndex.postings(spark, dirA)
      .select($"vec_id", $"cid".cast("long"), $"label".cast("long"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    // driver replay: every live row homes to its nearest A-centroid
    // and KEEPS its label
    val cents = IvfIndex.centroids(spark, dirA)
      .select($"cid".cast("long"), $"cq").as[(Long, Seq[Long])].collect()
    val vecs = emb.select($"vec_id", $"qv").as[(Long, Seq[Long])]
      .collect().toMap
    val wantIds = vecs.keys.filter(id =>
      id % 2 == 0 || id % 7 != 0).toSeq.sorted
    val want = wantIds.map { id =>
      (id, cents.minBy { case (c, cq) => (d2(vecs(id), cq), c) }._1,
        id % 4)
    }
    assert(got === want)
    // the merged rows serve through the label-pruned path
    val q = emb.filter($"vec_id" % 75 === 0)
      .select($"vec_id", $"qv", $"label")
    val served = IvfIndex.serveLabeled(spark, dirA, q)
      .select(col("query_id"), col("label"), col("neighbor"))
      .as[(Long, Long, Long)].collect()
    assert(served.nonEmpty)
    served.foreach { case (_, lbl, nb) =>
      assert(nb % 4 === lbl, "filtered serve must stay within the label") }
    // gen collision fails loudly; explicit replay is a no-op
    intercept[IllegalArgumentException] {
      IvfIndex.mergeFromLabeled(spark, dirA, dirB, gen = 1L)
    }
    IvfIndex.mergeFromLabeled(spark, dirA, dirB, gen = 1L,
      allowReplay = true)
    assert(IvfIndex.postings(spark, dirA)
      .select($"vec_id", $"cid".cast("long"), $"label".cast("long"))
      .as[(Long, Long, Long)].collect().toSeq.sorted === want)
    // the labeled path refuses unlabeled stores in either role
    val dirU = tmp("graft_lmU")
    IvfIndex.build(VectorOps.quantized(spark, sfDir)
      .filter($"vec_id" % 2 === 1), dirU)
    val asSrc = intercept[IllegalArgumentException] {
      IvfIndex.mergeFromLabeled(spark, dirA, dirU, gen = 2L)
    }
    assert(asSrc.getMessage.contains("UNLABELED"))
    val asDst = intercept[IllegalArgumentException] {
      IvfIndex.mergeFromLabeled(spark, dirU, dirB, gen = 2L)
    }
    assert(asDst.getMessage.contains("UNLABELED"))
  }

  test("labeled incremental ingest assigns like fresh argmin and keeps one file per directory") {
    import spark.implicits._
    val emb = VectorOps.quantized(spark, sfDir)
      .withColumn("label", col("vec_id") % 4)
    val dir = tmp("graft_lingest")
    IvfIndex.buildLabeled(emb.filter($"vec_id" % 5 =!= 0), dir)
    val batch = emb.filter($"vec_id" % 5 === 0)
    IvfIndex.addBatchLabeled(spark, dir,
      batch.select($"vec_id", $"qv", $"label"), gen = 1L)
    val cents = IvfIndex.centroids(spark, dir)
      .select($"cid".cast("long"), $"cq").as[(Long, Seq[Long])].collect()
    val got = IvfIndex.postings(spark, dir)
      .filter($"gen" === 1L)
      .select($"vec_id", $"cid".cast("long"), $"label".cast("long"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val want = batch.select($"vec_id", $"qv").as[(Long, Seq[Long])]
      .collect().map { case (id, qv) =>
        (id, cents.minBy { case (c, cq) => (d2(qv, cq), c) }._1, id % 4)
      }.toSeq.sorted
    assert(got === want)
    // replay is a metadata no-op
    val before = IvfIndex.postings(spark, dir).count()
    IvfIndex.addBatchLabeled(spark, dir,
      batch.select($"vec_id", $"qv", $"label"), gen = 1L)
    assert(IvfIndex.postings(spark, dir).count() === before)
    // one file per (cid, label, gen) directory — the q156 rule
    val root = new java.io.File(s"$dir/postings")
    def leafDirs(f: java.io.File): Seq[java.io.File] =
      if (f.listFiles == null) Nil
      else {
        val subs = f.listFiles.filter(_.isDirectory)
        if (subs.isEmpty) Seq(f) else subs.toSeq.flatMap(leafDirs)
      }
    leafDirs(root).foreach { d =>
      val parts = d.listFiles.filter(_.getName.endsWith(".parquet"))
      assert(parts.length <= 1,
        s"${d.getPath} holds ${parts.length} files — file-storm regression")
    }
    // an unlabeled batch / store pairing fails loudly
    intercept[IllegalArgumentException] {
      IvfIndex.addBatchLabeled(spark, dir,
        batch.select($"vec_id", $"qv"), gen = 2L)
    }
  }

  test("labeled PQ ingest encodes like the unlabeled path and keeps labels") {
    import spark.implicits._
    val emb = VectorOps.quantized(spark, sfDir)
    val lemb = emb.withColumn("label", col("vec_id") % 4)
    val (dirU, dirL) = (tmp("graft_pqing_u"), tmp("graft_pqing_l"))
    // identical base slice -> identical Lloyd, residuals, codebook:
    // the labeled path must produce byte-identical codes
    IvfIndex.buildPq(emb.filter($"vec_id" % 5 =!= 0), dirU)
    IvfIndex.buildPqLabeled(lemb.filter($"vec_id" % 5 =!= 0), dirL)
    val batch = lemb.filter($"vec_id" % 5 === 0)
    IvfIndex.addBatchPq(spark, dirU,
      batch.select($"vec_id", $"qv"), gen = 1L)
    IvfIndex.addBatchPqLabeled(spark, dirL,
      batch.select($"vec_id", $"qv", $"label"), gen = 1L)
    val gotU = IvfIndex.postings(spark, dirU).filter($"gen" === 1L)
      .select($"vec_id", $"cid".cast("long"), $"code")
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val gotL = IvfIndex.postings(spark, dirL).filter($"gen" === 1L)
      .select($"vec_id", $"cid".cast("long"), $"label".cast("long"),
        $"code")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(gotL.map(r => (r._1, r._2, r._4)) === gotU,
      "labeled PQ ingest diverged from the unlabeled encode")
    gotL.foreach { case (id, _, l, _) =>
      assert(l === id % 4, s"label drift for $id") }
    // filtered serve sees the ingested generation, label-scoped
    val queries = batch.limit(8).select($"vec_id", $"qv", $"label")
    val served = IvfIndex.servePqLabeled(spark, dirL, queries)
      .select($"query_id", $"label", $"neighbor")
      .as[(Long, Long, Long)].collect().toSeq
    assert(served.nonEmpty)
    served.foreach { case (q, l, nb) =>
      assert(l === q % 4 && nb % 4 === l,
        s"query $q: filtered PQ serve crossed labels") }
    // replay is a metadata no-op
    val before = IvfIndex.postings(spark, dirL).count()
    IvfIndex.addBatchPqLabeled(spark, dirL,
      batch.select($"vec_id", $"qv", $"label"), gen = 1L)
    assert(IvfIndex.postings(spark, dirL).count() === before)
    // guards: label-blind ingest into the labeled store and vice versa
    intercept[IllegalArgumentException] {
      IvfIndex.addBatchPq(spark, dirL,
        batch.select($"vec_id", $"qv"), gen = 2L)
    }
    intercept[IllegalArgumentException] {
      IvfIndex.addBatchPqLabeled(spark, dirU,
        batch.select($"vec_id", $"qv", $"label"), gen = 2L)
    }
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
