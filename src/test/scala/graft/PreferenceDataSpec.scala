package graft

import graft.operators.{PipelineOps, TextOps}

/** q193 labeler agreement + q194 preference pairs: driver-side replays
  * of the kappa arithmetic and the rank-and-pair rule on driver data.
  */
class PreferenceDataSpec extends SparkSpec {

  private case class Doc(id: Long, lang: String, source: String,
      toks: Array[String], text: String)

  private def load(d: String): Array[Doc] =
    spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => Doc(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3).split("\\s+", -1), r.getString(3)))

  test("q193 kappa matches a driver-side contingency replay") {
    val docs = load(sfDir)
    val stop = Set("a", "the", "of", "and", "to")
    val labels = docs.map { doc =>
      val n = doc.toks.length.toLong
      val la = if (n >= 20 && n <= 1000) 1 else 0
      val lb = if (doc.toks.count(stop).toLong * 25 >= n) 1 else 0
      val lc = if (doc.toks.distinct.length.toLong * 2 >= n) 1 else 0
      (doc.source, la, lb, lc)
    }
    def kappa(xs: Seq[(Int, Int)]): (Long, Long, Long) = {
      val n = xs.size.toLong
      val n11 = xs.count(p => p._1 == 1 && p._2 == 1).toLong
      val n00 = xs.count(p => p._1 == 0 && p._2 == 0).toLong
      val n10 = xs.count(p => p._1 == 1 && p._2 == 0).toLong
      val n01 = xs.count(p => p._1 == 0 && p._2 == 1).toLong
      val agree = n11 + n00
      val peNum = (n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)
      val num = n * agree - peNum
      val den = n * n - peNum
      val k = if (den == 0) 0L
        else math.signum(num) * ((1000L * math.abs(num)) / den)
      (n, agree, k)
    }
    val got = TextOps.defs("q193_labeler_agreement")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    for (pair <- Seq("A_B", "A_C", "B_C")) {
      def pick(t: (String, Int, Int, Int)): (Int, Int) = pair match {
        case "A_B" => (t._2, t._3)
        case "A_C" => (t._2, t._4)
        case _ => (t._3, t._4)
      }
      val all = kappa(labels.map(pick).toSeq)
      assert(got((pair, "__all__")) == all, s"$pair overall")
      labels.groupBy(_._1).foreach { case (src, ls) =>
        assert(got((pair, src)) == kappa(ls.map(pick).toSeq), s"$pair $src")
      }
    }
  }

  test("q194 pairs match a driver-side rank-and-pair replay") {
    val docs = load(sfDir)
    val scored = docs.map { doc =>
      val n = doc.toks.length.toLong
      (doc.id, doc.lang, doc.toks.distinct.length.toLong * 1000 / n, doc.text)
    }
    val want = scored.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      val best = ds.sortBy(x => (-x._3, x._1)).take(4)
      val worst = ds.sortBy(x => (x._3, x._1)).take(4)
      (0 until math.min(best.length, 4)).flatMap { i =>
        val (b, w) = (best(i), worst(i))
        val r = i + 1L
        if (r * 2 <= ds.length && b._3 - w._3 >= 100 && b._4 != w._4)
          Some((lang, r, b._1, w._1, b._3, w._3, b._3 - w._3))
        else None
      }
    }.sortBy(x => (x._1, x._2))
    val got = PipelineOps.defs("q194_preference_pairs")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want)
    got.foreach { p =>
      assert(p._7 >= 100 && p._3 != p._4 && p._5 > p._6)
    }
  }
}
