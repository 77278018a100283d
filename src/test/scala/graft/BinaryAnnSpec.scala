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

  /** The exact oracle rule, straight-line Scala. */
  private def reference(): Map[Long, (Long, Long)] = {
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
      val short = others.sortBy(n => (ham(raw(n), raw(q)), n)).take(20)
      val hamTop5 = short.take(5).toSet
      val refTop5 = short.sortBy(n => (dist(raw(n), raw(q)), n)).take(5).toSet
      val exact = others.sortBy(n => (dist(raw(n), raw(q)), n)).take(5).toSet
      q -> ((hamTop5.intersect(exact).size.toLong,
        refTop5.intersect(exact).size.toLong))
    }.toMap
  }

  test("q191 matches the driver brute force on a clustered corpus") {
    val got = VectorOps.defs("q191_binary_sign_ann")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val ref = reference()
    ref.foreach { case (q, (nh, nr)) =>
      assert(got(q) == ((nh, nr)), s"query $q: got ${got(q)} want ($nh,$nr)")
    }
    val overall = got(-1L)
    assert(overall._1 == ref.values.map(_._1).sum)
    assert(overall._2 == ref.values.map(_._2).sum)
  }

  test("refine never loses a shortlist-surviving true neighbor") {
    // structural: exact-top5 ∩ shortlist ⊆ refined-top5, so per query
    // n_refined >= n_ham — on the constructed corpus AND the driver data
    for (d <- Seq(dir, sfDir)) {
      val rows = VectorOps.defs("q191_binary_sign_ann")(spark, d).collect()
      rows.filter(_.getLong(0) >= 0).foreach { r =>
        assert(r.getLong(3) >= r.getLong(2),
          s"query ${r.getLong(0)} in $d: refined ${r.getLong(3)} < ham ${r.getLong(2)}")
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
