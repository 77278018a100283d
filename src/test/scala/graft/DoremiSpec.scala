package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** q205/q206 DoReMi mixture training: a straight-line Scala replica of
  * the multiplicative-weights loop (smooth permille log2, mixture
  * unigram per round, clamped excess, renormalized update) run from
  * the collected (source, tok, c) relation must reproduce every round
  * row; the materialized mixture must match a driver replay of the
  * hash-ordered prefix-greedy admission.
  */
class DoremiSpec extends SparkSpec {

  private def logq(x: Long): Long =
    if (x <= 0L) 0L
    else {
      val b = 63L - java.lang.Long.numberOfLeadingZeros(x)
      val m10 = if (b >= 10) x >> (b - 10) else x << (10 - b)
      val t = (m10 - 1024L) * 1000L / 1024L
      1000L * b + t + t * (1000L - t) / 3466L
    }

  test("q205 equals the straight-line driver replay, round by round") {
    import spark.implicits._
    val sc = TextOps.docs(spark, sfDir)
      .select($"source", explode($"toks").as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
    val bySource = sc.groupBy(_._1)
    val sources = bySource.keys.toSeq.sorted
    val nS = bySource.view.mapValues(_.map(_._3).sum).toMap
    val cself = sources.map { s0 =>
      val n = nS(s0)
      val sm = bySource(s0).map { case (_, _, c) => c * logq(c) }.sum
      s0 -> (n * logq(n) - sm) / n
    }.toMap
    var w = sources.map(_ -> 1000000L / sources.length).toMap
    val want = (1 to TextOps.DoremiRounds).flatMap { r =>
      // mixture unigram in 2^-30 rate units under the current weights
      val mix = scala.collection.mutable.Map.empty[String, Long]
      sc.foreach { case (s0, tok, c) =>
        mix(tok) = mix.getOrElse(tok, 0L) +
          w(s0) * (c * TextOps.DoremiScale / nS(s0))
      }
      val mixtot = mix.values.sum
      val excess = sources.map { s0 =>
        val mm = bySource(s0).map { case (_, tok, c) => c * logq(mix(tok)) }.sum
        val cmix = (nS(s0) * logq(mixtot) - mm) / nS(s0)
        s0 -> math.max(0L, cmix - cself(s0))
      }.toMap
      val wRaw = sources.map(s0 =>
        s0 -> w(s0) * (1024L + excess(s0) / 2L) / 1024L).toMap
      val tot = wRaw.values.sum
      val wNext = sources.map(s0 =>
        s0 -> math.max(1L, wRaw(s0) * 1000000L / tot)).toMap
      val out = sources.map(s0 =>
        (r.toLong, s0, w(s0), excess(s0), wNext(s0)))
      w = wNext
      out
    }
    val got = SparkEntry.queries("q205_doremi_weights")(spark, sfDir)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(got.sorted === want.sorted)
    // the loop must actually move: some weight differs from uniform
    val uniform = 1000000L / sources.length
    assert(got.exists(r => r._5 != uniform),
      "degenerate run: no weight ever moved off uniform")
    // final weights stay positive and roughly normalized
    val fin = got.filter(_._1 == TextOps.DoremiRounds.toLong)
    assert(fin.forall(_._5 >= 1L))
    val sumW = fin.map(_._5).sum
    assert(math.abs(sumW - 1000000L) <= sources.length.toLong,
      s"final weights sum $sumW")
  }

  test("q206 equals the driver replay of hash-ordered prefix admission") {
    import spark.implicits._
    val (_, wFinal, totalTokens) = TextOps.doremiRun(spark, sfDir)
    def h60(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val perDoc = TextOps.docs(spark, sfDir)
      .select($"source", $"doc_id", size($"toks").cast("long").as("nt"))
      .as[(String, Long, Long)].collect()
    val want = perDoc.groupBy(_._1).map { case (s0, ds) =>
      val budget = wFinal(s0) * totalTokens / 1000000L
      var cum = 0L; var nd = 0L; var ntk = 0L
      ds.sortBy { case (_, id, _) => (h60(id), id) }.foreach {
        case (_, _, nt) =>
          if (cum < budget) { nd += 1; ntk += nt }
          cum += nt
      }
      s0 -> (wFinal(s0), budget, nd, ntk,
        if (budget == 0L) -1L else ntk * 1000L / budget)
    }
    val got = SparkEntry.queries("q206_doremi_mixture")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got === want)
  }

  test("q210's budget stage IS q206's admission, on the chain survivors") {
    import spark.implicits._
    // 1. the composed release's admitted set equals a driver replay of
    //    q206's rule (same hash order, same prefix-greedy cut) over the
    //    chain's survivor relation with clean-mass budgets
    val (_, wFinal, _) = TextOps.doremiRun(spark, sfDir)
    def h60(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val st = graft.operators.PipelineOps.releaseStages(spark, sfDir, 3000L)
    val surv = st.cleaned.filter($"n_clean" >= 1L)
      .join(st.deduped.select($"doc_id", $"source"), "doc_id")
      .select($"source", $"doc_id", $"n_clean".as("nt"))
      .as[(String, Long, Long)].collect()
    val totalClean = surv.map(_._3).sum
    val want = surv.groupBy(_._1).map { case (s0, ds) =>
      val budget = wFinal(s0) * totalClean / 1000000L
      var cum = 0L; var nd = 0L; var ntk = 0L
      ds.sortBy { case (_, id, _) => (h60(id), id) }.foreach {
        case (_, _, nt) =>
          if (cum < budget) { nd += 1; ntk += nt }
          cum += nt
      }
      s0 -> ((nd, ntk))
    }
    val got = SparkEntry.queries("q210_doremi_release")(spark, sfDir)
      .select($"source", $"n_docs_admitted", $"n_tokens_admitted")
      .as[(String, Long, Long)].collect()
      .filter { case (_, nd, _) => nd > 0L }
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === want.filter(_._2._1 > 0L))
    // 2. the SAME helper on the raw corpus reproduces q206 exactly —
    //    the executable tie between the composed entry's budget stage
    //    and the mixture entry
    val (_, _, totalTokens) = TextOps.doremiRun(spark, sfDir)
    val wDf = wFinal.toSeq.sorted.map { case (src, wp) =>
      (src, wp, wp * totalTokens / 1000000L)
    }.toDF("source", "w_ppm", "budget_tokens")
    val perDoc = TextOps.docs(spark, sfDir)
      .select($"source", $"doc_id", size($"toks").cast("long").as("nt"))
    val viaHelper = TextOps.doremiAdmission(perDoc, wDf)
      .groupBy($"source")
      .agg(count(lit(1)).as("nd"), sum($"nt").as("ntk"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val q206Rows = SparkEntry.queries("q206_doremi_mixture")(spark, sfDir)
      .select($"source", $"n_docs_admitted", $"n_tokens_admitted")
      .as[(String, Long, Long)].collect()
      .filter(_._2 > 0L)
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(viaHelper === q206Rows)
  }
}
