package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, PipelineOps, VectorOps}

/** q172 release-to-serving: the per-language stage ledger is pinned
  * against independently recomputed release stages, the recall block
  * against a driver brute force over the admitted corpus, and the
  * sparse-id seeding path (`buildPq(seedSmallest = true)`) against a
  * population with NO ids below 16 — the case the default seed rule
  * cannot build at all.
  */
class ReleaseServeSpec extends SparkSpec {

  private def d2(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("q172 ledger and recall block are internally consistent with the release") {
    import spark.implicits._
    val got = SparkEntry.queries("q172_release_to_serving")(spark, sfDir)
      .as[(String, String, Long)].collect().toSeq
    val m = got.groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap)
      .toMap

    // the admitted set, recomputed through the same shared stage helper
    val st = PipelineOps.releaseStages(spark, sfDir, 3000L)
    val adm = st.kept.select($"lang", $"doc_id", $"n_clean")
      .as[(String, Long, Long)].collect().toSeq
    val admByLang = adm.groupBy(_._1)
    assert(m("docs_admitted") ===
      admByLang.view.mapValues(_.size.toLong).toMap)
    assert(m("toks_admitted") ===
      admByLang.view.mapValues(_.map(_._3).sum).toMap)

    val emb = VectorOps.quantized(spark, sfDir)
      .as[(Long, Seq[Long])].collect().toMap
    val admIds = adm.map(_._2).filter(emb.contains)
    assert(m("vecs_indexed").values.sum === admIds.size.toLong)

    // recall block vs a driver brute force over the admitted corpus
    val qids = admIds.filter(_ % 5 == 0).sorted
    assert(m("n_queries")("*") === qids.size.toLong)
    val exact = qids.map { q =>
      q -> admIds.filter(_ != q)
        .sortBy(n => (d2(emb(n), emb(q)), n)).take(5).toSet
    }.toMap
    assert(m("k_total")("*") === exact.values.map(_.size.toLong).sum)
    val kT = m("k_total")("*")
    assert(m("adc_permille")("*") === m("adc_hits")("*") * 1000 / kT)
    assert(m("refine_permille")("*") === m("refine_hits")("*") * 1000 / kT)
    // the exact re-rank of a superset shortlist can only help
    assert(m("refine_hits")("*") >= m("adc_hits")("*"))
    assert(m("refine_hits")("*") > 0L, "fixture recall should be nonzero")
  }

  test("seedSmallest builds and serves a population with no ids below 16") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val emb = (100L until 160L).map(id =>
        (id, Seq.fill(64)(rnd.nextInt(2000).toLong - 1000L)))
      .toDF("vec_id", "qv")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_seedsmall").toString + "/ix"
    IvfIndex.buildPq(emb, dir, seedSmallest = true)
    val queries = emb.filter($"vec_id" % 10 === 0)
    val got = IvfIndex.servePq(spark, dir, queries, probes = 2, k = 3)
      .select($"query_id", $"rank", $"neighbor")
      .as[(Long, Long, Long)].collect().toSeq
    val qs = (100L until 160L).filter(_ % 10 == 0)
    assert(got.map(_._1).distinct.sorted === qs)
    assert(got.groupBy(_._1).values.forall(_.size == 3))
    assert(got.forall { case (q, _, n) => n != q && n >= 100L && n < 160L })
  }
}
