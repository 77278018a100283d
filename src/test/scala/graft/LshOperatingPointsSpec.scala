package graft

import graft.functions.TextHashes
import graft.operators.TextOps

/** q201 LSH operating points: driver-side replay of every banding
  * configuration plus the nesting invariant of the halving family —
  * a (2,8) band match means both (4,4) sub-bands match, so candidate
  * sets (and hits) are monotone in the band count.
  */
class LshOperatingPointsSpec extends SparkSpec {

  test("q201 matches a driver-side banding + exact-truth replay") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(t: String): Long = {
      val dig = md.digest(t.getBytes("UTF-8"))
      var h = 0L; var b = 0
      while (b < 8) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
      h >>> 4
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .filter(_.getLong(0) % 5 == 0)
      .map { r =>
        val toks = r.getString(1).split("\\s+", -1).toSeq
        (r.getLong(0), toks.distinct.map(h60).toSet,
          TextHashes.md5MinhashSigScala(toks, 16))
      }
    val ids = docs.map(_._1).sorted
    val byId = docs.map(d => d._1 -> d).toMap
    val pairs = for {
      i <- ids.indices; j <- (i + 1) until ids.length
    } yield (ids(i), ids(j))
    // the VERIFIED SINGLE-MINHASH CEILING: pairs sharing >=1 of the 16
    // minhash values, exactly checked at J >= 1/2 (the operator's
    // denominator; a true pair escapes all 16 with prob <= 2^-16)
    val truth = pairs.filter { case (a, b) =>
      val (sa, sb) = (byId(a)._3, byId(b)._3)
      (0 until 16).exists(i => sa(i) == sb(i))
    }.filter { case (a, b) =>
      val (sa, sb) = (byId(a)._2, byId(b)._2)
      val inter = sa.intersect(sb).size
      val uni = sa.size + sb.size - inter
      uni > 0 && 2 * inter >= uni
    }.toSet
    val want = Seq((2, 8), (4, 4), (8, 2), (16, 1)).map { case (b, r) =>
      val cand = pairs.filter { case (x, y) =>
        val (sx, sy) = (byId(x)._3, byId(y)._3)
        (0 until b).exists(i =>
          (i * r until (i + 1) * r).forall(p => sx(p) == sy(p)))
      }.toSet
      val hit = cand.intersect(truth).size.toLong
      (b.toLong, r.toLong, truth.size.toLong, cand.size.toLong, hit)
    }
    val got = TextOps.defs("q201_lsh_operating_points")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
  }

  test("the halving family nests: candidates and hits are monotone") {
    val rows = TextOps.defs("q201_lsh_operating_points")(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi.getLong(3) >= lo.getLong(3), "candidates must not shrink")
      assert(hi.getLong(4) >= lo.getLong(4), "hits must not shrink")
    }
    // n_truth constant across rows
    assert(rows.map(_.getLong(2)).distinct.length == 1)
  }
}
