package graft

import org.apache.spark.sql.Row

/** q163 hybrid retrieval: an INDEPENDENT driver-side Scala replication
  * of the whole pipeline (tokenize → BM25 over the 5 rarest shared
  * terms → exact quantized-L2 dense top-20 → RRF fusion → top-10),
  * compared row-exact against the Spark implementation. This exercises
  * the risky joints the DuckDB oracle alone can mask: the bounded
  * top-k aggregator standing in for a window sort on the dense side,
  * the full-outer fusion join's coalesce typing, and the idf cap.
  */
class HybridRetrievalSpec extends SparkSpec {

  private val K = 60
  private def rrfOf(rank: Long): Long =
    if (rank > 0) 1000000L / (K + rank) else 0L

  private def bruteForce(): Seq[(Long, Long, Long, Long, Long, Long)] = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val v = r.getSeq[Float](1).toArray
          .map(x => math.floor(x.toDouble * 1000d + 0.5d).toLong)
        r.getLong(0) -> v
      }.toMap
    // Spark's split(text, "\\s+") == Java split with limit -1
    val toks = docs.map { case (id, t) => id -> t.split("\\s+", -1).toSeq }
    val dl = toks.map { case (id, ts) => id -> ts.length.toLong }.toMap
    val nDocs = dl.size.toLong
    val avgMil = dl.values.sum * 1000L / nDocs
    val tf: Map[(String, Long), Long] = toks
      .flatMap { case (id, ts) => ts.map(t => (t, id)) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val dfm: Map[String, Long] =
      tf.keys.groupBy(_._1).map { case (t, ks) => t -> ks.size.toLong }
    val queryIds = docs.map(_._1)
      .filter(id => id % 100 == 0 && embs.contains(id)).sorted
    val out = queryIds.flatMap { q =>
      val qtoks = toks.find(_._1 == q).get._2.distinct
        .filter(t => dfm(t) >= 2)
        .sortBy(t => (dfm(t), t)).take(5)
      val sparse = docs.map(_._1).filter(_ != q).flatMap { d =>
        val score = qtoks.map { t =>
          tf.get((t, d)).fold(0L) { f =>
            val idfK = math.min(1000L * nDocs / dfm(t), 1000000L)
            (idfK * 44L * avgMil * f) /
              (20L * avgMil * f + 6L * avgMil + 18L * dl(d) * 1000L)
          }
        }.sum
        if (qtoks.exists(t => tf.contains((t, d)))) Some(d -> score) else None
      }.sortBy { case (d, sc) => (-sc, d) }.take(20)
        .zipWithIndex.map { case ((d, _), i) => d -> (i + 1).toLong }.toMap
      val qv = embs(q)
      val dense = embs.toSeq.filter(_._1 != q).map { case (d, v) =>
        d -> v.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sortBy { case (d, dist) => (dist, d) }.take(20)
        .zipWithIndex.map { case ((d, _), i) => d -> (i + 1).toLong }.toMap
      (sparse.keySet ++ dense.keySet).toSeq.map { d =>
        val sr = sparse.getOrElse(d, 0L)
        val dr = dense.getOrElse(d, 0L)
        (q, d, sr, dr, rrfOf(sr) + rrfOf(dr))
      }.sortBy { case (_, d, _, _, f) => (-f, d) }.take(10)
        .zipWithIndex.map { case ((qq, d, sr, dr, f), i) =>
          (qq, (i + 1).toLong, d, f, sr, dr)
        }
    }
    out
  }

  test("q163 equals an independent driver-side brute force") {
    val got = operators.TextOps.defs("q163_hybrid_retrieval")(spark, sfDir)
      .collect().map { r: Row =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))
      }.toSeq
    val want = bruteForce()
    assert(got.nonEmpty, "fixture produced no fused results")
    assert(got == want)
  }

  test("q163 rrf column is consistent with the emitted system ranks") {
    val rows = operators.TextOps.defs("q163_hybrid_retrieval")(spark, sfDir)
      .collect()
    assert(rows.forall { r =>
      r.getLong(3) == rrfOf(r.getLong(4)) + rrfOf(r.getLong(5))
    })
  }
}
