package graft

import graft.operators.TextOps

/** q196–q198 model-eval suite: driver-side replays of the exact AUC
  * (including a hand-checked tie case), the reliability buckets, and
  * the order-statistic threshold rule.
  */
class EvalSuiteSpec extends SparkSpec {

  private def frame(d: String): Array[(Long, String, Long, Long)] =
    spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map { r =>
        val toks = r.getString(2).split("\\s+", -1)
        val n = toks.length.toLong
        (r.getLong(0), r.getString(1), toks.distinct.length.toLong * 1000 / n,
          if (n >= 20 && n <= 1000) 1L else 0L)
      }

  /** Textbook AUC: fraction of (pos, neg) pairs ranked correctly,
    * ties counting half — the definition the rank formula must equal.
    */
  private def aucPairs(xs: Seq[(Long, Long)]): Long = {
    val pos = xs.filter(_._2 == 1L).map(_._1)
    val neg = xs.filter(_._2 == 0L).map(_._1)
    if (pos.isEmpty || neg.isEmpty) -1L
    else {
      val num = (for (p <- pos; q <- neg) yield {
        if (p > q) 2L else if (p == q) 1L else 0L
      }).sum
      1000L * num / (2L * pos.length * neg.length)
    }
  }

  test("q196 equals the pairwise AUC definition, per source and overall") {
    val ef = frame(sfDir)
    val got = TextOps.defs("q196_auc_exact")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    val bySrc = ef.groupBy(_._2)
    bySrc.foreach { case (src, xs) =>
      assert(got(src) == aucPairs(xs.map(x => (x._3, x._4)).toSeq), src)
    }
    assert(got("__all__") == aucPairs(ef.map(x => (x._3, x._4)).toSeq))
  }

  test("q196 handles perfect-inverse, tied, and single-class groups") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_auc").toString
    // sA: scores 100 (y=0) vs 33 (y=1) -> every pair inverted, AUC 0.
    // sT: all four docs tie at score 50 with mixed labels -> AUC
    //     exactly 500 (the tie-averaged rank half-credit).
    // sB: single class -> -1 (explicitly undefined).
    def rep(t: String, n: Int) = ((t + " ") * n).trim
    // 2 distinct over 10 tokens = 200 permille (y=0: too short);
    // 8 distinct over 40 tokens = 200 permille (y=1): a true 4-way tie
    def tie10(a: String, b: String) = rep(a, 5) + " " + rep(b, 5)
    def tie40(p: String) =
      (0 until 8).map(i => rep(s"$p$i", 5)).mkString(" ")
    val crafted = Seq(
      (1L, rep("a", 10), "sA"), (2L, rep("b", 30), "sA"),
      (3L, rep("c", 10), "sA"), (4L, rep("d", 30), "sA"),
      (10L, tie10("p", "q"), "sT"), (11L, tie10("r", "s"), "sT"),
      (12L, tie40("x"), "sT"), (13L, tie40("z"), "sT"),
      (5L, rep("k", 40), "sB"), (6L, rep("m", 50), "sB"))
    crafted.map { case (id, text, src) =>
      (id, text, src, "en", text.length.toLong) }
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val ef = frame(tmp)
    val got = TextOps.defs("q196_auc_exact")(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    ef.groupBy(_._2).foreach { case (src, xs) =>
      assert(got(src) == aucPairs(xs.map(x => (x._3, x._4)).toSeq), src)
    }
    assert(got("sA") == 0L)
    assert(got("sB") == -1L)
  }

  test("q197 buckets reconcile with the frame") {
    val ef = frame(sfDir)
    val want = ef.groupBy(x => x._3 * 10 / 1001).map { case (b, xs) =>
      b -> ((xs.length.toLong, xs.map(_._4).sum,
        xs.map(_._4).sum * 1000 / xs.length,
        xs.map(_._3).sum / xs.length))
    }
    val got = TextOps.defs("q197_reliability_table")(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
  }

  test("q198 threshold is the exact 90%-recall order statistic") {
    val ef = frame(sfDir)
    val groups = ef.groupBy(_._2).toSeq :+ ("__all__" -> ef.toSeq.toArray)
    val got = TextOps.defs("q198_threshold_calibration")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    groups.foreach { case (src, xs) =>
      val pos = xs.filter(_._4 == 1L).sortBy(x => (x._3, x._1))
      val k = ((9 * pos.length + 9) / 10)
      val t = pos(k - 1)._3
      val kept = xs.count(_._3 <= t).toLong
      val falseAdmit = xs.count(x => x._3 <= t && x._4 == 0L).toLong
      assert(got(src) == ((pos.length.toLong, t, kept, falseAdmit)), src)
      // the cap really admits >= 90% of positives
      assert(pos.count(_._3 <= t) * 10 >= pos.length * 9, src)
    }
  }
}
