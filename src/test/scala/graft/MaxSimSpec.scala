package graft

import java.security.MessageDigest

/** q178 late-interaction retrieval: an independent driver-side
  * re-implementation (chunking, hashing, rare-2 prefix candidates,
  * exact-integer squared cosine, MaxSim, top-5) compared row-exact
  * against the operator on the fixture corpus, plus plan pins (the
  * rank windows compile to WindowGroupLimit; no cartesian product —
  * the scorer only ever joins the candidate relation).
  */
class MaxSimSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q178 equals a driver brute force on the fixture corpus") {
    import spark.implicits._
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()

    // chunking (the q151 CDC rule) + per-chunk hashed vectors;
    // chunk identity = the 60-bit md5 prefix, as in the operator
    case class Chunk(doc: Long, h: Long, m: Long, toks: Seq[String])
    val chunks = texts.flatMap { case (doc, t) =>
      val toks = Option(t).getOrElse("").split("\\s+", -1).toSeq
      if (toks.isEmpty) Seq.empty
      else {
        val bpos = toks.indices.filter(i =>
          java.lang.Long.parseLong(md5hex(toks(i)).take(7), 16) % 8 == 0)
        val starts = 0 +: bpos.map(_ + 1)
        val ends = bpos.map(_ + 1) :+ toks.length
        starts.zip(ends).map { case (a, b) => toks.slice(a, b).mkString(" ") }
          .filter(_.nonEmpty)
          .map(c => (doc, java.lang.Long.parseLong(md5hex(c).take(15), 16), c))
      }
    }.groupBy(c => (c._1, c._2)).map { case ((doc, h), occ) =>
      Chunk(doc, h, occ.size.toLong, occ.head._3.split(" ", -1).toSeq)
    }.toSeq
    assert(chunks.nonEmpty)

    def vecOf(c: Chunk): Map[Long, Long] =
      c.toks.groupBy(t =>
        java.lang.Long.parseLong(md5hex(t).take(15), 16) % 16)
        .map { case (d, ts) => d -> ts.size.toLong }
    val vecs = chunks.map(c => (c.doc, c.h) -> vecOf(c)).toMap
    val n2 = vecs.map { case (k, v) => k -> v.values.map(x => x * x).sum }

    // rare-2 prefix per chunk: df = #distinct chunks containing the token
    val tokd = chunks.flatMap(c => c.toks.distinct.map(t => (c.doc, c.h, t)))
    val df = tokd.groupBy(_._3).map { case (t, xs) => t -> xs.size.toLong }
    val pref = chunks.flatMap { c =>
      c.toks.distinct.sortBy(t => (df(t), t)).take(2)
        .map(t => (c.doc, c.h, t))
    }
    val byTok = pref.groupBy(_._3)
    val cand = pref.filter(_._1 % 100 == 0).flatMap { case (qd, qh, t) =>
      byTok(t).filter(_._1 != qd).map(c => (qd, qh, c._1, c._2))
    }.distinct
    assert(cand.nonEmpty, "fixture produced no candidates")

    // exact-integer squared cosine (permille), MaxSim, top-5
    val qcos2 = cand.map { case (qd, qh, cd, ch) =>
      val (va, vb) = (vecs((qd, qh)), vecs((cd, ch)))
      val dot = va.keySet.intersect(vb.keySet).toSeq
        .map(k => va(k) * vb(k)).sum
      ((qd, qh, cd), dot * dot * 1000L / (n2((qd, qh)) * n2((cd, ch))))
    }
    val mx = qcos2.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).max }
    val mById = chunks.map(c => (c.doc, c.h) -> c.m).toMap
    val score = mx.toSeq.groupBy { case ((qd, _, cd), _) => (qd, cd) }
      .map { case ((qd, cd), xs) =>
        (qd, cd,
          xs.map { case ((_, qh, _), v) => mById((qd, qh)) * v }.sum,
          xs.size.toLong)
      }.toSeq
    val want = score.groupBy(_._1).toSeq.flatMap { case (qd, xs) =>
      xs.sortBy(x => (-x._3, x._2)).take(5).zipWithIndex
        .map { case ((_, cd, sc, nh), i) => (qd, i + 1L, cd, sc, nh) }
    }.sortBy(v => (v._1, v._2))

    val got = operators.TextOps.defs("q178_maxsim_chunks")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === want)
    // MaxSim invariant: each query doc has <= 5 rows, ranks contiguous
    got.groupBy(_._1).values.foreach { rows =>
      assert(rows.size <= 5)
      assert(rows.map(_._2).sorted === (1L to rows.size))
    }
  }

  test("q178 plan: rank windows are group-limited, no cartesian product") {
    val df = operators.TextOps.defs("q178_maxsim_chunks")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
    assert(!plan.contains("CartesianProduct"))
  }
}
