package graft

import org.apache.spark.sql.functions._

/** q180 release-to-loader: the manifest must cover EXACTLY the q155
  * admitted set (same per-language doc/token mass), its per-source
  * offsets must be a gapless concat order over cleaned counts, and
  * the sequence arithmetic must match a driver fold.
  */
class ReleasePackingSpec extends SparkSpec {

  private def manifest =
    SparkEntry.queries("q180_release_packing")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  test("offsets are a gapless per-source concat order; arithmetic exact") {
    val rows = manifest
    assert(rows.nonEmpty)
    rows.groupBy(_._2).values.foreach { g =>
      g.sortBy(_._1).foldLeft(0L) {
        case (expOff, (doc, _, nClean, off, seqFirst, nSplits)) =>
          assert(off === expOff, s"doc $doc")
          assert(seqFirst === off / 512, s"doc $doc")
          assert(nSplits ===
            (off + math.max(nClean, 1L) - 1) / 512 - off / 512, s"doc $doc")
          assert(nClean >= 1L, s"doc $doc: admitted doc with empty text")
          expOff + nClean
      }
    }
  }

  test("the packed set IS the release's admitted set (q155 accounting)") {
    import spark.implicits._
    val packed = manifest
    val perLangPacked = packed
      .map { case (doc, _, n, _, _, _) => (doc, n) }
    // q155's per-language (docs_kept, toks_kept) over the same budget
    val q155 = SparkEntry.queries("q155_corpus_release")(spark, sfDir)
      .select($"lang", $"docs_kept", $"toks_kept")
      .as[(String, Long, Long)].collect()
    assert(q155.map(_._2).sum === perLangPacked.length.toLong)
    assert(q155.map(_._3).sum === perLangPacked.map(_._2).sum)
    // and doc-for-doc: the kept relation equals the manifest's doc set
    val kept = operators.PipelineOps
      .releaseStages(spark, sfDir, 3000L).kept
      .select($"doc_id", $"n_clean").as[(Long, Long)].collect().toSet
    assert(perLangPacked.toSet === kept)
  }
}
