package graft

import org.apache.spark.sql.functions._

/** q155 — the composed release pipeline. Pins per-stage accounting on a
  * constructed corpus with known exact dups, short docs, and shared
  * boilerplate, plus the cross-stage invariants on the driver fixture.
  */
class CorpusReleaseSpec extends SparkSpec {

  private def release(rows: Seq[(Long, String, String, String)]) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_rel").toString
    rows.toDF("doc_id", "lang", "source", "text")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("q155_corpus_release")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq.sortBy(_._1)
  }

  test("stage accounting on a constructed corpus") {
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")
    def words(pfx: String, n: Int) = (1 to n).map(i => s"$pfx$i").mkString(" ")
    val rows = Seq(
      // en: one exact-dup pair (doc 2 dropped), one too-short doc
      // (doc 3), two boilerplate-sharing docs (10 tokens stripped each)
      (1L, "en", "s0", words("a", 25)),
      (2L, "en", "s0", words("a", 25)),            // exact dup of 1
      (3L, "en", "s0", "tiny doc"),                // quality drop (< 20)
      (4L, "en", "s0", s"$boiler ${words("c", 15)}"),
      (5L, "en", "s1", s"$boiler ${words("d", 15)}"),
      // de: clean singleton
      (6L, "de", "s0", words("e", 30)))
    val got = release(rows)
    val byLang = got.map(r => r._1 -> r).toMap
    val en = byLang("en")
    // (lang, n_in, dup_dropped, quality_dropped, span_removed,
    //  docs_kept, toks_kept, fill)
    assert(en._2 == 5L && en._3 == 1L && en._4 == 1L)
    assert(en._5 == 20L, s"both boilerplate docs lose their 10 tokens: $en")
    // survivors: doc1 (25 clean), doc4/doc5 (15 clean each) -> all fit
    assert(en._6 == 3L && en._7 == 55L)
    val de = byLang("de")
    assert(de == (("de", 1L, 0L, 0L, 0L, 1L, 30L, 10L)))
  }

  test("cross-stage invariants hold on the driver fixture") {
    import spark.implicits._
    val got = SparkEntry.queries("q155_corpus_release")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (lang, nIn, dup, qual, span, kept, toks, fill) =>
      assert(dup >= 0 && qual >= 0 && span >= 0, lang)
      assert(dup + qual <= nIn, s"$lang stage drops exceed input")
      assert(kept <= nIn - dup - qual, s"$lang kept exceeds survivors")
      assert(toks <= 3000L, s"$lang budget overrun")
      assert(fill == 1000L * toks / 3000L, lang)
    }
    // the fixture has shared boilerplate — the span stage must bite
    // (exact text dups exist at sf0.01 but not in the sf0.001 slice, so
    // the dedup stage is exercised by the constructed-corpus test)
    assert(got.map(_._5).sum > 0, "no span mass removed on fixture")
  }

  test("q184 semantic-stage invariants hold and the stage actually bites") {
    import spark.implicits._
    val got = SparkEntry.queries("q184_release_semantic")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got.nonEmpty)
    got.foreach { case (lang, nIn, dup, qual, sem, span, kept, toks,
        fill) =>
      assert(dup >= 0 && qual >= 0 && sem >= 0 && span >= 0, lang)
      assert(dup + qual + sem <= nIn, s"$lang stage drops exceed input")
      assert(kept <= nIn - dup - qual - sem,
        s"$lang kept exceeds semantic survivors")
      assert(toks <= 3000L, s"$lang budget overrun")
      assert(fill == 1000L * toks / 3000L, lang)
    }
    assert(got.map(_._5).sum > 0,
      "the semantic stage should drop something on the fixture")
    // v2 never keeps MORE docs per language than v1 at the same budget
    // when the semantic stage removed token mass ahead of the window —
    // compare the per-language survivor pools instead: v2's
    // quality-stage numbers must equal v1's (the upstream stages are
    // identical)
    val v1 = SparkEntry.queries("q155_corpus_release")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    got.foreach { case (lang, nIn, dup, qual, _, _, _, _, _) =>
      assert(v1(lang) === ((nIn, dup, qual)),
        s"$lang: upstream stages must match q155 exactly")
    }
  }

  test("q188 diff ties out against q155 and q184 exactly") {
    import spark.implicits._
    val diff = SparkEntry.queries("q188_release_diff")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(diff.nonEmpty)
    val v1 = SparkEntry.queries("q155_corpus_release")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> (r._6, r._7)).toMap // docs/toks kept
    val v2 = SparkEntry.queries("q184_release_semantic")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> (r._7, r._8)).toMap
    diff.foreach { case (lang, n1, t1, n2, t2, stable, lSem, lOther,
        gained) =>
      // the diff's per-version totals ARE the audits' kept numbers
      assert((n1, t1) === v1(lang), s"$lang: v1 side disagrees with q155")
      assert((n2, t2) === v2(lang), s"$lang: v2 side disagrees with q184")
      // membership algebra: v1 = stable + lost, v2 = stable + gained
      assert(n1 === stable + lSem + lOther, s"$lang: lost split broken")
      assert(n2 === stable + gained, s"$lang: gained split broken")
    }
    // the diff must show real movement on the fixture: something lost
    // to the semantic stage somewhere
    assert(diff.map(_._7).sum > 0, "no semantic losses surfaced")
  }

  test("q189: incremental span rule equals full recompute over old ∪ new") {
    import spark.implicits._
    val corpus3 = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"lang")
      .as[(Long, String, String)].collect().toSeq
    val langOf = corpus3.map(d => d._1 -> d._3).toMap
    val corpus = corpus3.map(d => (d._1, d._2))
    def toks(t: String) = t.split("\\s+")
    def wins(t: String): Seq[(Int, String)] = {
      val tk = toks(t)
      if (tk.length < 8) Nil
      else tk.sliding(8).zipWithIndex
        .map { case (w, i) => (i + 1, w.mkString(" ")) }.toSeq
    }
    // the two quality populations, exactly as the q189 chains build them
    val old = corpus.filter(_._1 % 7 != 6)
    val fresh = corpus.filter(_._1 % 7 == 6)
    val tOld = old.groupBy(_._2).map { case (_, xs) => xs.minBy(_._1) }
      .filter { case (_, t) => val n = toks(t).length; n >= 20 && n <= 1000 }
      .toSeq
    val oldTexts = old.map(_._2).toSet
    val tNew = fresh.filterNot(d => oldTexts.contains(d._2))
      .groupBy(_._2).map { case (_, xs) => xs.minBy(_._1) }
      .filter { case (_, t) => val n = toks(t).length; n >= 20 && n <= 1000 }
      .toSeq
    val oldDigest = tOld.flatMap(d => wins(d._2).map(_._2)).toSet
    val newWinDocs = tNew.flatMap { case (id, t) =>
      wins(t).map { case (_, w) => (w, id) } }
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).distinct.size }
    // per new doc: dup-window starts under BOTH predicates must agree
    val combinedDocs = (tOld ++ tNew).flatMap { case (id, t) =>
      wins(t).map { case (_, w) => (w, id) } }
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).distinct.size }
    var oldPathBit = false
    tNew.foreach { case (id, t) =>
      wins(t).foreach { case (_, w) =>
        val inc = oldDigest.contains(w) || newWinDocs(w) >= 2
        val full = combinedDocs(w) >= 2
        assert(inc === full, s"doc $id window '$w': predicates diverge")
        if (inc && oldDigest.contains(w) && newWinDocs(w) < 2)
          oldPathBit = true
      }
    }
    assert(oldPathBit,
      "fixture never exercised the frozen-digest path — weaken alarm")
    // full driver brute force of the remaining chain: v1 budget spend,
    // per-lang remainders, greedy admission — compared exactly
    def coveredLen(starts: Seq[Int]): Long =
      starts.sorted.foldLeft((0L, Option.empty[Int])) {
        case ((acc, prev), i) =>
          (acc + prev.map(p => math.min(8, i - p)).getOrElse(8).toLong,
            Some(i))
      }._1
    val oldWinDocs = tOld.flatMap { case (id, t) =>
      wins(t).map { case (_, w) => (w, id) } }
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).distinct.size }
    val v1Clean = tOld.map { case (id, t) =>
      val dup = wins(t).filter { case (_, w) => oldWinDocs(w) >= 2 }.map(_._1)
      (id, langOf(id), toks(t).length.toLong - coveredLen(dup))
    }
    def greedy(cands: Seq[(Long, Long)], budget: Long): (Long, Long) = {
      // (docs, toks) admitted from (id, n_clean) by (n_clean desc, id):
      // PREFIX semantics — the running sum includes every ranked doc,
      // so one overflow ends admission (the engine's cum ≤ budget rule)
      var cum = 0L; var n = 0L; var tk = 0L
      cands.filter(_._2 >= 1).sortBy { case (id, c) => (-c, id) }
        .foreach { case (_, c) =>
          cum += c
          if (cum <= budget) { n += 1; tk = cum } }
      (n, tk)
    }
    val toksV1 = v1Clean.groupBy(_._2).map { case (l, xs) =>
      l -> greedy(xs.map(x => (x._1, x._3)), 3000L)._2 }
    val newClean = tNew.map { case (id, t) =>
      val dup = wins(t).filter { case (_, w) =>
        oldDigest.contains(w) || newWinDocs(w) >= 2 }.map(_._1)
      (id, langOf(id), toks(t).length.toLong - coveredLen(dup))
    }
    val expected = corpus3.map(_._3).distinct.sorted.map { l =>
      val rem = 3000L - toksV1.getOrElse(l, 0L)
      val (n, tk) = greedy(
        newClean.filter(_._2 == l).map(x => (x._1, x._3)), rem)
      (l, n, tk, rem)
    }
    val got = SparkEntry.queries("q189_incremental_release")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(got.map(r => (r._1, r._6, r._7, r._8)) === expected,
      "admission disagrees with the driver greedy over the frozen state")
    got.foreach { case (lang, nNew, dup, qual, span, _, toksAdm,
        remaining, fill) =>
      assert(dup >= 0 && qual >= 0 && span >= 0, lang)
      assert(dup + qual <= nNew, s"$lang: stage drops exceed batch")
      assert(toksAdm <= remaining, s"$lang: admitted past the remainder")
      assert(fill <= 1000L, s"$lang: overfilled")
      assert(fill == 1000L * ((3000L - remaining) + toksAdm) / 3000L, lang)
    }
  }
}
