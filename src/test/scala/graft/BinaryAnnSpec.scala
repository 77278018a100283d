package graft

import graft.operators.VectorOps

/** q191 binary sign-quantization ANN: driver-side brute-force replay on
  * a constructed clustered corpus (64-dim so both packed words carry
  * bits), plus the structural invariant that makes the refine stage
  * worth shipping: a true top-5 member that SURVIVES the Hamming
  * shortlist is always recovered by the exact re-rank, so
  * n_refined >= n_ham on every query.
  */
class BinaryAnnSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    val dim = 64
    val centroids = Array.fill(6, dim)(rnd.nextGaussian())
    val rows = (0L until 420L).map { id =>
      val c = (id % 6).toInt
      val v = centroids(c).map(x => (x + 0.2 * rnd.nextGaussian()).toFloat)
      (id, v.toSeq, c)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_bin").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  /** The exact oracle rule, straight-line Scala: per query, the raw
    * Hamming recall hits and the refined hits per shortlist width.
    */
  private def reference(): Map[Long, (Long, Map[Long, Long])] = {
    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000d + 0.5d).toLong).toArray)
      .toMap
    val queries = raw.keys.filter(_ % 100 == 0).toSeq.sorted
    def ham(a: Array[Long], b: Array[Long]): Long =
      a.indices.count(i => (a(i) > 0) != (b(i) > 0)).toLong
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => { val d = a(i) - b(i); d * d }).sum
    queries.map { q =>
      val others = raw.keys.filter(_ != q).toSeq
      val short = others.sortBy(n => (ham(raw(n), raw(q)), n)).take(100)
      val hamTop5 = short.take(5).toSet
      val exact = others.sortBy(n => (dist(raw(n), raw(q)), n)).take(5).toSet
      val perWidth = Seq(20, 64, 100).map { w =>
        val refTop5 = short.take(w)
          .sortBy(n => (dist(raw(n), raw(q)), n)).take(5).toSet
        w.toLong -> refTop5.intersect(exact).size.toLong
      }.toMap
      q -> ((hamTop5.intersect(exact).size.toLong, perWidth))
    }.toMap
  }

  test("q191 matches the driver brute force on a clustered corpus") {
    // widened shape (round 13): (width, query_id, k, n_ham, n_refined, …)
    val got = VectorOps.defs("q191_binary_sign_ann")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    val ref = reference()
    Seq(20L, 64L, 100L).foreach { w =>
      ref.foreach { case (q, (nh, byWidth)) =>
        assert(got((w, q)) == ((nh, byWidth(w))),
          s"width $w query $q: got ${got((w, q))} want ($nh,${byWidth(w)})")
      }
      val overall = got((w, -1L))
      assert(overall._1 == ref.values.map(_._1).sum)
      assert(overall._2 == ref.values.map(_._2(w)).sum)
    }
  }

  test("refine never loses a shortlist-surviving true neighbor") {
    // structural: exact-top5 ∩ shortlist ⊆ refined-top5, so per query
    // n_refined >= n_ham — on the constructed corpus AND the driver
    // data; and widening the shortlist can only help (monotone in
    // width for each query, the nesting argument)
    for (d <- Seq(dir, sfDir)) {
      val rows = VectorOps.defs("q191_binary_sign_ann")(spark, d).collect()
      rows.filter(_.getLong(1) >= 0).foreach { r =>
        assert(r.getLong(4) >= r.getLong(3),
          s"width ${r.getLong(0)} query ${r.getLong(1)} in $d: " +
            s"refined ${r.getLong(4)} < ham ${r.getLong(3)}")
      }
      val byQuery = rows.filter(_.getLong(1) >= 0)
        .groupBy(_.getLong(1)).values
      byQuery.foreach { qs =>
        val sorted = qs.sortBy(_.getLong(0)).map(_.getLong(4)).toSeq
        assert(sorted == sorted.sorted,
          s"refined recall not monotone in width: $sorted")
      }
    }
  }

  test("binary codes pack signs into disjoint 32-bit words") {
    import spark.implicits._
    val emb = VectorOps.quantized(spark, dir)
    val codes = VectorOps.binaryCodes(emb).collect()
    val raw = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    codes.foreach { r =>
      val qv = raw(r.getLong(0))
      val w0 = r.getLong(2); val w1 = r.getLong(3)
      (0 until 32).foreach { i =>
        assert(((w0 >> i) & 1L) == (if (qv(i) > 0) 1L else 0L))
        assert(((w1 >> i) & 1L) == (if (qv(i + 32) > 0) 1L else 0L))
      }
      assert((w0 >>> 32) == 0L && (w1 >>> 32) == 0L)
    }
  }
}
