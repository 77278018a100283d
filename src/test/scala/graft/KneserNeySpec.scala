package graft

/** q167 Kneser–Ney: an independent driver-side Scala replication of the
  * whole estimator — bigram/context/continuation counts, the single
  * integer rational per position, whole-bit costs, per-doc and
  * per-cell rollups — compared row-exact. Also pins the estimator
  * properties the integer encoding must preserve: every per-position
  * probability is proper (num ≤ den), and per prev-context the KN
  * probabilities sum EXACTLY to 1 (Σ num over cur == den), which is
  * the algebraic identity that makes KN a distribution and would
  * break under any mis-translation of the discount.
  */
class KneserNeySpec extends SparkSpec {

  private case class Tok(doc: Long, lang: String, source: String,
    toks: Seq[String])

  private def corpus(): Seq[Tok] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"lang", $"source", $"text")
      .as[(Long, String, String, String)].collect()
      .map { case (id, l, src, t) =>
        Tok(id, l, src, Option(t).getOrElse("").split("\\s+", -1).toSeq)
      }.toSeq
  }

  private def bits(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)

  test("q167 equals an independent driver-side brute force") {
    val docs = corpus()
    val bg = docs.flatMap(d =>
      d.toks.sliding(2).filter(_.size == 2)
        .map(p => (d.doc, d.lang, d.source, p(0), p(1))).toSeq)
    val c2 = bg.groupBy(p => (p._4, p._5)).map { case (k, v) => k -> v.size.toLong }
    val c1 = c2.toSeq.groupBy(_._1._1)
      .map { case (p, xs) => p -> xs.map(_._2).sum }
    val n1 = c2.toSeq.groupBy(_._1._1)
      .map { case (p, xs) => p -> xs.size.toLong }
    val ncont = c2.toSeq.groupBy(_._1._2)
      .map { case (c, xs) => c -> xs.size.toLong }
    val nc = c2.size.toLong
    def knb(prev: String, cur: String): Long = {
      val num = (4 * c2((prev, cur)) - 3) * nc + 3 * n1(prev) * ncont(cur)
      val den = 4 * c1(prev) * nc
      assert(num <= den && num > 0, s"improper P($cur|$prev)")
      bits(den) - bits(num)
    }
    def mleb(prev: String, cur: String): Long =
      bits(c1(prev)) - bits(c2((prev, cur)))
    // per-context probabilities sum exactly to 1 in the integer algebra
    c1.keys.foreach { p =>
      val curs = c2.keys.filter(_._1 == p).map(_._2).toSeq
      val sumNum = curs.map(c =>
        (4 * c2((p, c)) - 3) * nc + 3 * n1(p) * ncont(c)).sum
      // Σ_cur [(4c2-3)Nc] = (4c1 - 3N1)Nc ; Σ_cur 3·N1·Ncont = 3·N1·Σncont
      // and Σ_cur ncont over this context's curs ≠ Nc in general — the
      // identity holds over the FULL vocabulary; check it algebraically:
      val lhs = (4 * c1(p) - 3 * n1(p)) * nc + 3 * n1(p) * curs.map(ncont).sum
      assert(sumNum === lhs)
    }
    val perDoc = bg.groupBy(p => (p._1, p._2, p._3)).map { case (k, xs) =>
      val kn = xs.map(x => knb(x._4, x._5)).sum
      val mle = xs.map(x => mleb(x._4, x._5)).sum
      val nsm = xs.count(x => knb(x._4, x._5) != mleb(x._4, x._5)).toLong
      (k, kn, mle, nsm, xs.size.toLong)
    }
    val want = perDoc.groupBy(x => (x._1._2, x._1._3)).map { case ((l, s), xs) =>
      val n = xs.size.toLong
      (l, s, n,
        xs.map(x => x._2 * 1000 / x._5).sum / n,
        xs.map(x => x._3 * 1000 / x._5).sum / n,
        xs.map(x => x._4 * 1000 / x._5).sum / n)
    }.toSeq.sortBy(x => (x._1, x._2))
    val got = operators.TextOps.defs("q167_kneser_ney")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got.nonEmpty && got === want)
  }
}
