package graft

import graft.operators.{PipelineOps, TextOps, VectorOps}

/** Brute-force driver-side recomputation of the round-12 curation
  * extras — q185 DSIR importance selection, q186 watermark detection,
  * q187 semantic decontamination — on the sf0.001 corpus: every value
  * the distributed plan produces is re-derived with plain Scala
  * collections and compared exactly. (The DuckDB oracle checks
  * cross-engine agreement; this checks both engines against the
  * definition.)
  */
class CurationExtrasSpec extends SparkSpec {

  private lazy val corpus: Seq[(Long, String, String)] = {
    import spark.implicits._
    Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"source")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
  }
  private def toks(text: String): Array[String] = text.split("\\s+")
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  /** First 15 hex chars of md5 as an unsigned 60-bit long — the q98
    * bucket idiom (conv(substring(md5(x),1,15),16,10)).
    */
  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)
  private def flog2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)

  test("q186: watermark green-transition z-test equals brute force") {
    import spark.implicits._
    val perDoc = corpus.map { case (_, text, source) =>
      val t = toks(text)
      val m = math.max(t.length - 1, 0).toLong
      val g = (0 until t.length - 1).count { i =>
        h60(t(i) + "|" + t(i + 1) + "|wm1") % 2 == 0
      }.toLong
      val scored = m >= 16
      val d = 2 * g - m
      val flagged = scored && d > 0 && d * d > 4 * m
      (source, m, g, scored, flagged)
    }
    val expected = perDoc.groupBy(_._1).toSeq.map { case (src, xs) =>
      (src, xs.size.toLong,
        xs.count(_._4).toLong,
        xs.count(_._5).toLong,
        xs.filter(_._4).map(_._3).sum,
        xs.filter(_._4).map(_._2).sum)
    }.sortBy(_._1)
    val got = TextOps.defs("q186_watermark_detect")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // the test should actually score documents at this corpus size
    assert(expected.map(_._3).sum > 0)
  }

  test("q185: DSIR whole-bit importance selection equals brute force") {
    import spark.implicits._
    val B = 256L
    val withGrams = corpus.map { case (id, text, source) =>
      val t = toks(text)
      val grams = t.toSeq ++
        (0 until t.length - 1).map(i => t(i) + " " + t(i + 1))
      (id, source, t.length.toLong, id % 23 == 5,
        grams.groupBy(g => h60(g) % B).map { case (b, gs) => (b, gs.size.toLong) })
    }
    val tgtC = new scala.collection.mutable.HashMap[Long, Long]()
    val rawC = new scala.collection.mutable.HashMap[Long, Long]()
    withGrams.foreach { case (_, _, _, isTgt, bc) =>
      val m = if (isTgt) tgtC else rawC
      bc.foreach { case (b, c) => m(b) = m.getOrElse(b, 0L) + c }
    }
    val tn = tgtC.values.sum
    val rn = rawC.values.sum
    def bitdiff(b: Long): Long =
      (flog2(rn + B) - flog2(rawC.getOrElse(b, 0L) + 1)) -
        (flog2(tn + B) - flog2(tgtC.getOrElse(b, 0L) + 1))
    val cand = withGrams.filterNot(_._4).map { case (id, src, nTok, _, bc) =>
      (id, src, nTok, bc.map { case (b, c) => c * bitdiff(b) }.sum)
    }
    val expected = cand.groupBy(_._2).toSeq.map { case (src, xs) =>
      val k = xs.size / 4
      val sel = xs.sortBy { case (id, _, _, w) => (-w, id) }.take(k)
      (src, xs.size.toLong, sel.size.toLong,
        sel.map(_._4).sum, sel.map(_._3).sum,
        if (sel.isEmpty) 0L else sel.map(_._4).min)
    }.sortBy(_._1)
    val got = PipelineOps.defs("q185_dsir_select")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // selection must be non-trivial: someone selected, weights not all equal
    assert(expected.map(_._3).sum > 0)
  }

  test("q187: semantic decontamination equals brute force") {
    import spark.implicits._
    val vecs: Seq[(Long, Array[Long])] = Tables(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toSeq.sortBy(_._1)
      .map { case (id, e) =>
        (id, e.map(x => math.floor(x.toDouble * 1000 + 0.5).toLong))
      }
    def n2(v: Array[Long]): Long = v.map(x => x * x).sum
    val withN2 = vecs.map { case (id, v) => (id, v, n2(v)) }.filter(_._3 > 0)
    val ev = withN2.filter(_._1 % 97 == 0)
    val tr = withN2.filter(_._1 % 97 != 0)
    val expected = ev.map { case (eid, evq, en2) =>
      val scored = tr.map { case (tid, tq, tn2) =>
        val dot = tq.zip(evq).map { case (a, b) => a * b }.sum
        val mag = dot * dot * 1000 / (tn2 * en2)
        val c2p = if (dot >= 0) mag else -mag
        (tid, c2p)
      }
      val (bestId, bestC2p) = scored.minBy { case (tid, c2p) => (-c2p, tid) }
      (eid, bestC2p, bestId, scored.count(_._2 >= 40).toLong)
    }.sortBy(_._1)
    val got = VectorOps.defs("q187_semantic_decontam")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(expected.nonEmpty)
  }
}
