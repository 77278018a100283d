package graft

import graft.operators.{PipelineOps, TextOps}

/** Brute-force driver-side recomputation of the round-7 corpus-signal
  * operators (q136 duplicated-span coverage, q137 collocation pairs,
  * q138 bigram surprisal, q139 containment decontamination) on the
  * sf0.001 corpus: every value the distributed plan produces is
  * re-derived from the raw text with plain Scala collections and
  * compared exactly. (The DuckDB oracle checks cross-engine agreement;
  * this checks both engines against the definition.)
  */
class CorpusSignalsSpec extends SparkSpec {

  private lazy val corpus: Seq[(Long, String, String, String)] = {
    import spark.implicits._
    Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"lang", $"source")
      .as[(Long, String, String, String)].collect().toSeq.sortBy(_._1)
  }
  private def toks(text: String): Array[String] = text.split("\\s+")
  private def flog2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)

  // 8-token window strings per doc (windows, not distinct), docs with >= 8 toks
  private lazy val windows: Map[Long, Seq[String]] = corpus.flatMap {
    case (id, text, _, _) =>
      val t = toks(text)
      if (t.length < 8) None
      else Some(id -> t.sliding(8).map(_.mkString(" ")).toSeq)
  }.toMap

  test("q136: duplicated-span coverage equals brute-force recompute") {
    import spark.implicits._
    val docsPerWin = windows.toSeq
      .flatMap { case (id, ws) => ws.map(w => (w, id)) }
      .groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).distinct.size) }
    val expected = windows.toSeq.map { case (id, ws) =>
      val nDup = ws.count(w => docsPerWin(w) >= 2).toLong
      (id, ws.size.toLong, nDup,
        if (ws.nonEmpty) 1000L * nDup / ws.size else 0L)
    }.filter { case (_, nw, nd, _) => 2 * nd >= nw }
      .sortBy { case (id, _, _, p) => (-p, id) }
    val got = TextOps.defs("q136_dup_span_coverage")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("q143: covered-token interval union equals brute force") {
    import spark.implicits._
    val docsPerWin = windows.toSeq
      .flatMap { case (id, ws) => ws.map(w => (w, id)) }
      .groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).distinct.size) }
    // per doc: union length of [i, i+7] over duplicated-window starts
    val coveredPerDoc: Map[Long, Long] = windows.map { case (id, ws) =>
      val starts = ws.zipWithIndex
        .filter { case (w, _) => docsPerWin(w) >= 2 }.map(_._2 + 1)
      val covered = starts.foldLeft((0L, Option.empty[Int])) {
        case ((acc, prev), i) =>
          (acc + prev.map(p => math.min(8, i - p)).getOrElse(8).toLong, Some(i))
      }._1
      (id, covered)
    }
    val expected = corpus.groupBy(_._4).toSeq.map { case (source, ds) =>
      val nTok = ds.map { case (_, text, _, _) => toks(text).length.toLong }.sum
      val cov = ds.map { case (id, _, _, _) => coveredPerDoc.getOrElse(id, 0L) }.sum
      (source, ds.size.toLong, nTok, cov, 1000L * cov / nTok)
    }.sortBy(_._1)
    val got = TextOps.defs("q143_span_dedup_budget")(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("q137: top-30 collocation pairs and integer lift equal brute force") {
    import spark.implicits._
    val allToks = corpus.flatMap { case (_, text, _, _) => toks(text) }
    val uc = allToks.groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
    val total = allToks.size.toLong
    val pairOcc = corpus.flatMap { case (id, text, _, _) =>
      val t = toks(text)
      if (t.length < 2) Nil else t.sliding(2).map(p => (p.mkString(" "), id)).toSeq
    }
    val expected = pairOcc.groupBy(_._1).toSeq
      .map { case (p, xs) => (p, xs.size.toLong, xs.map(_._2).distinct.size.toLong) }
      .sortBy { case (p, c, _) => (-c, p) }.take(30)
      .map { case (p, c, nd) =>
        val Array(l, r) = p.split(" ", 2)
        (p, c, nd, 1000L * c * total / (uc(l) * uc(r)))
      }
    val got = TextOps.defs("q137_colloc_pairs")(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("q138: bigram/unigram bits per (lang, source) equal brute force") {
    import spark.implicits._
    val allToks = corpus.flatMap { case (_, text, _, _) => toks(text) }
    val uc = allToks.groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
    val total = allToks.size.toLong
    val bigrams = corpus.flatMap { case (_, text, _, _) =>
      val t = toks(text)
      if (t.length < 2) Nil else t.sliding(2).map(p => (p(0), p(1))).toSeq
    }
    val bc = bigrams.groupBy(identity).map { case (b, xs) => (b, xs.size.toLong) }
    val perDoc = corpus.flatMap { case (_, text, lang, source) =>
      val t = toks(text)
      if (t.length < 2) None
      else {
        val pos = t.sliding(2).map(p => (p(0), p(1))).toSeq
        val bg = pos.map { case (p, c) => flog2(uc(p)) - flog2(bc((p, c))) }.sum
        val ug = pos.map { case (_, c) => flog2(total) - flog2(uc(c)) }.sum
        Some(((lang, source), (bg, ug, pos.size.toLong)))
      }
    }
    val expected = perDoc.groupBy(_._1).toSeq.map { case ((lang, source), xs) =>
      val ds = xs.map(_._2)
      (lang, source, ds.size.toLong,
        ds.map { case (bg, _, nt) => bg * 1000 / nt }.sum / ds.size,
        ds.map { case (_, ug, nt) => ug * 1000 / nt }.sum / ds.size,
        ds.map { case (bg, ug, nt) => (ug - bg) * 1000 / nt }.sum / ds.size)
    }.sortBy { case (l, s, _, _, _, _) => (l, s) }
    val got = TextOps.defs("q138_bigram_surprisal")(spark, sfDir)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("q144: BPE merge table equals single-node reference trainer") {
    import spark.implicits._
    val wc = corpus.flatMap { case (_, text, _, _) => toks(text) }
      .filter(_.matches("^[a-z]+$"))
      .groupBy(identity).map { case (w, xs) => (w, xs.size.toLong) }
    var state: Seq[(Vector[String], Long)] = wc.toSeq.map { case (w, c) =>
      (w.map(_.toString).toVector :+ "</w>", c)
    }
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    for (k <- 1 to 8) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- state; i <- 0 until syms.length - 1)
        pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + c
      val ((l, r), cnt) = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
      merges += ((k.toLong, l, r, l + r, cnt))
      state = state.map { case (syms, c) =>
        val out = scala.collection.mutable.Buffer[String]()
        for (sym <- syms) {
          if (out.nonEmpty && out.last == l && sym == r) {
            out.remove(out.length - 1); out += (l + r)
          } else out += sym
        }
        (out.toVector, c)
      }
    }
    val got = TextOps.defs("q144_bpe_merges")(spark, sfDir)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got == merges.result())

    // q145: segmentation report under the final merge table (words
    // reconstruct from their symbols by stripping the </w> marker, which
    // merged symbols may carry embedded, e.g. "ow</w>")
    val wordSyms: Map[String, Int] = state.map { case (syms, _) =>
      (syms.mkString.replace("</w>", ""), syms.length)
    }.toMap
    val bySource = corpus.flatMap { case (_, text, _, src) =>
      toks(text).filter(_.matches("^[a-z]+$")).map(w => (src, w))
    }.groupBy { case (src, _) => src }
    val expected145 = bySource.toSeq.map { case (src, ws) =>
      val nTok = ws.size.toLong
      val nChar = ws.map { case (_, w) => (w.length + 1).toLong }.sum
      val nBpe = ws.map { case (_, w) => wordSyms(w).toLong }.sum
      (src, nTok, nChar, nBpe, 1000L * nBpe / nChar)
    }.sortBy(_._1)
    val got145 = TextOps.defs("q145_bpe_segment")(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got145 == expected145)
  }

  test("q146: source-vs-corpus whole-bit divergence equals brute force") {
    import spark.implicits._
    val all = corpus.flatMap { case (_, text, _, src) =>
      toks(text).map(w => (src, w))
    }
    val gc = all.groupBy(_._2).map { case (w, xs) => (w, xs.size.toLong) }
    val nTotal = all.size.toLong
    val expected = all.groupBy(_._1).toSeq.map { case (src, ws) =>
      val sc = ws.groupBy(_._2).map { case (w, xs) => (w, xs.size.toLong) }
      val nTok = ws.size.toLong
      val selfMass = sc.map { case (_, c) => c * flog2(c) }.sum
      val corpusMass = sc.map { case (w, c) => c * flog2(gc(w)) }.sum
      val corpusNum = nTok * flog2(nTotal) - corpusMass
      val selfNum = nTok * flog2(nTok) - selfMass
      (src, nTok, sc.size.toLong,
        corpusNum * 1000 / nTok, selfNum * 1000 / nTok, corpusNum - selfNum)
    }.sortBy(_._1)
    val got = TextOps.defs("q146_source_divergence")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("q139: best-containment matches equal brute force") {
    import spark.implicits._
    val gramSets: Map[Long, Set[String]] =
      windows.map { case (id, ws) => (id, ws.toSet) }
    val (ev, tr) = gramSets.partition { case (id, _) => id % 10 == 3 }
    val expected = ev.toSeq.flatMap { case (eid, egrams) =>
      val matches = tr.toSeq
        .map { case (tid, tg) => (tid, (egrams & tg).size.toLong) }
        .filter(_._2 > 0)
      if (matches.isEmpty) None
      else {
        val (bestId, shared) =
          matches.minBy { case (tid, n) => (-n, tid) }
        val n = egrams.size.toLong
        if (4 * shared >= n)
          Some((eid, bestId, shared, n, 1000L * shared / n))
        else None
      }
    }.sortBy(_._1)
    val got = PipelineOps.defs("q139_containment_decontam")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }
}
