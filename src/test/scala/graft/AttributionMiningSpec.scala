package graft

import java.sql.Timestamp
import graft.operators.{VectorOps, Windows}

/** Brute-force driver-side recomputation of q141 (last-touch attribution)
  * and q142 (IVF-routed hard-negative mining) on sf0.001 — every value
  * re-derived from the raw rows with plain Scala, including the exact
  * sequential-double dot products and Spark's HALF_UP round(x, 6).
  */
class AttributionMiningSpec extends SparkSpec {

  test("q141: channel attribution equals brute-force event replay") {
    import spark.implicits._
    val events = Tables(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value",
        get_json_k($"props"))
      .as[(Long, Timestamp, Long, String, Double, Long)].collect().toSeq
    val sevenDaysUs = 7L * 24 * 3600 * 1000000L
    def kindOf(t: String) =
      if (t == "click") 0 else if (t == "purchase") 1 else 2
    val attributed = events.groupBy(_._3).toSeq.flatMap { case (_, evs) =>
      var lastClick: Option[(Timestamp, Long)] = None
      evs.sortBy { case (id, ts, _, t, _, _) => (micros(ts), kindOf(t), id) }
        .flatMap { case (_, ts, _, t, v, k) =>
          if (kindOf(t) == 0) { lastClick = Some((ts, k)); None }
          else if (kindOf(t) == 1) {
            val ch = lastClick match {
              case Some((cts, ck))
                if micros(ts) - micros(cts) <= sevenDaysUs => ck
              case _ => -1L
            }
            Some((ch, math.floor(v * 100 + 0.5).toLong))
          } else None
        }
    }
    val expected = attributed.groupBy(_._1).toSeq
      .map { case (ch, xs) => (ch, xs.size.toLong, xs.map(_._2).sum) }
      .sortBy(_._1)
    val got = Windows.defs("q141_lasttouch_attribution")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  private def micros(ts: Timestamp): Long =
    ts.getTime / 1000 * 1000000 + ts.getNanos / 1000

  private def get_json_k(c: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.functions._
    get_json_object(c, "$.k").cast("long").as("k")
  }

  test("q142: hard negatives equal brute-force IVF replay") {
    import spark.implicits._
    val vecs = Tables(spark, sfDir, "embeddings")
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Seq[Float])].collect().toSeq.sortBy(_._1)
      .map { case (id, l, emb) => (id, l, emb.map(_.toDouble).toArray) }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val withN = vecs.map { case (id, l, v) => (id, l, v, math.sqrt(dot(v, v))) }
    val cents = withN.filter(_._1 < 16)
    // per vector: centroid ranks by (csim desc, cent_id)
    def ranks(v: Array[Double], nrm: Double): Seq[Long] =
      cents.map { case (cid, _, cv, cn) => (cid, dot(v, cv) / (nrm * cn)) }
        .sortBy { case (cid, csim) => (-csim, cid) }.map(_._1)
    val assigned = withN.map { case (id, l, v, n) => (id, l, v, n, ranks(v, n).head) }
    val queries = withN.filter(_._1 % 100 == 0).flatMap { case (id, l, v, n) =>
      ranks(v, n).take(2).map(c => (id, l, v, n, c))
    }
    val cand = for {
      (qid, ql, qv, qn, qc) <- queries
      (aid, al, av, an, ac) <- assigned
      if ac == qc && aid != qid
    } yield (qid, ql, aid, al, r6(dot(av, qv) / (an * qn)))
    val pos = cand.filter(c => c._4 == c._2).groupBy(_._1)
      .map { case (q, xs) => (q, xs.map(_._5).max) }
    val expected = cand.filter(c => c._4 != c._2).groupBy(_._1).toSeq
      .flatMap { case (q, xs) =>
        pos.get(q).toSeq.flatMap { p =>
          xs.sortBy { case (_, _, nb, _, cos) => (-cos, nb) }.take(3)
            .zipWithIndex.map { case ((_, _, nb, _, cos), i) =>
              (q, (i + 1).toLong, nb, cos, p)
            }
        }
      }.sortBy(r => (r._1, r._2))
    val got = VectorOps.defs("q142_hard_negatives")(spark, sfDir)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == expected)
  }
}
