package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorOps
import graft.functions.VectorHashes

/** ANN quality tests on constructed clustered embeddings (the driver
  * embeddings are near-orthogonal random vectors, so recall there is
  * meaningless — see VectorOps scaladoc).
  */
class VectorOpsSpec extends SparkSpec {

  private lazy val clusteredDir: String = {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val dim = 32
    val centroids = Array.fill(8, dim)(rnd.nextGaussian())
    val rows = (0L until 400L).map { id =>
      val c = (id % 8).toInt
      val v = centroids(c).map(x => (x + 0.15 * rnd.nextGaussian()).toFloat)
      (id, v.toSeq, c)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_vec").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  private def topk(name: String): Map[Long, Set[Long]] =
    VectorOps.defs(name)(spark, clusteredDir)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  test("LSH ANN recalls most true neighbors on clustered data") {
    val exact = topk("q37_knn_bruteforce")
    val approx = topk("q38_ann_lsh")
    val recalls = exact.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean > 0.7, s"LSH mean recall too low: $mean")
  }

  test("IVF ANN recalls most true neighbors on clustered data") {
    val exact = topk("q37_knn_bruteforce")
    val approx = topk("q40_ann_ivf")
    val recalls = exact.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean > 0.7, s"IVF mean recall too low: $mean")
  }

  test("hyperplane bucket is deterministic and respects nPlanes range") {
    val v = Seq.fill(32)(scala.util.Random.nextGaussian())
    val b1 = VectorHashes.bucketScala(v, 4)
    val b2 = VectorHashes.bucketScala(v, 4)
    assert(b1 == b2)
    assert(b1 >= 0 && b1 < 16)
    assert(VectorHashes.probeBuckets(b1, 4).size == 5)
  }

  test("brute-force kNN: cosine of identical vectors ranks first") {
    import spark.implicits._
    val dupDir = {
      val rnd = new scala.util.Random(17)
      val base = (0L until 200L).map(id => (id, Seq.fill(16)(rnd.nextGaussian().toFloat), 0))
      // vec 100 duplicates vec 0 (a query id): must be its top neighbor
      val fixed = base.map { case (id, v, l) => (id, if (id == 100L) base(0)._2 else v, l) }
      val tmp = java.nio.file.Files.createTempDirectory("graft_vec_dup").toString
      fixed.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
      tmp
    }
    val res = VectorOps.defs("q37_knn_bruteforce")(spark, dupDir)
      .filter($"query_id" === 0 && $"rank" === 1)
      .collect()
    assert(res.length == 1 && res(0).getLong(1) == 100L,
      s"duplicate vector must rank first: ${res.mkString}")
    assert(math.abs(res(0).getDouble(2) - 1.0) < 1e-9)
  }

  test("cosine-dedup similarity join recalls clustered near-dup pairs") {
    import spark.implicits._
    // brute-force all pairs above threshold on the clustered corpus
    val e = VectorOps.defs("q60_cosine_dedup")(spark, clusteredDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val V = spark.read.parquet(s"$clusteredDir/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val ids = V.keys.toSeq.sorted
    val truth = (for {
      i <- ids; j <- ids if i < j
      if cos(V(i), V(j)) > 0.35
    } yield (i, j)).toSet
    assert(e.subsetOf(truth), s"non-true pairs: ${(e -- truth).take(3)}")
    val recall = if (truth.isEmpty) 1.0 else e.size.toDouble / truth.size
    assert(recall > 0.6, s"similarity-join recall too low: $recall")
  }

  test("q72 kmeans assignment matches a driver-side Lloyd step exactly") {
    val out = VectorOps.defs("q72_kmeans_assign")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference: same quantization + argmin computed in plain Scala
    val V = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000 + 0.5).toLong).toArray)
      .sortBy(_._1)
    val cents = V.filter(_._1 < 10)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val assigned = V.map { case (id, v) =>
      val (cid, dist) = cents.map { case (cid, cv) => (cid, d2(v, cv)) }
        .minBy { case (cid, dist) => (dist, cid) }
      (cid, dist)
    }
    val expected = assigned.groupBy(_._1).map { case (cid, xs) =>
      (cid, xs.length.toLong, xs.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    assert(out.toSeq == expected)
    assert(out.map(_._2).sum == V.length) // every vector assigned once
  }

  test("q105 ivf-pq: ranks well-formed and neighbors come from the query's cluster") {
    import spark.implicits._
    // structural invariants on the driver embeddings
    val out = VectorOps.defs("q105_ivfpq_ann")(spark, sfDir)
      .select($"query_id", $"neighbor", $"adc", $"rank")
      .as[(Long, Long, Long, Long)].collect()
    out.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.length <= 5)
      assert(sorted.map(_._4).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq)
      assert(rs.forall(_._2 != q))
    }
    // on clustered 64-dim data, IVF lists align with clusters (the
    // "trained" centroids are cluster members), so probed neighbors
    // should overwhelmingly share the query's true cluster
    val rnd = new scala.util.Random(17)
    val centroids = Array.fill(8, 64)(rnd.nextGaussian())
    val rows = (0L until 400L).map { id =>
      val c = (id % 8).toInt
      (id, centroids(c).map(x => (x + 0.15 * rnd.nextGaussian()).toFloat).toSeq, c)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val label = rows.map(r => r._1 -> r._3).toMap
    val nbr = VectorOps.defs("q105_ivfpq_ann")(spark, tmp)
      .select($"query_id", $"neighbor").as[(Long, Long)].collect()
    val inCluster = nbr.count { case (q, n) => label(q) == label(n) }
    assert(nbr.nonEmpty &&
      inCluster.toDouble / nbr.length > 0.7,
      s"cluster purity ${inCluster.toDouble / nbr.length}")
  }

  test("q93 semdedup: accounting is consistent and drops are real near-dups") {
    import spark.implicits._
    val out = VectorOps.defs("q93_semdedup")(spark, sfDir)
      .select($"cid", $"n_vecs", $"n_dropped", $"n_kept")
      .as[(Long, Long, Long, Long)].collect()
    out.foreach { case (_, n, d, k) => assert(k + d == n && d >= 0 && k >= 1) }
    assert(out.map(_._2).sum ==
      spark.read.parquet(s"$sfDir/embeddings.parquet").count())
    // clustered data (dense near-dup neighborhoods) must actually drop
    val clustered = VectorOps.defs("q93_semdedup")(spark, clusteredDir)
      .select($"n_dropped").as[Long].collect()
    assert(clustered.sum > 0, "no drops on densely clustered vectors")
  }

  test("q125: recall numbers reconcile with the raw q37/q40 id sets") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ex = VectorOps.defs("q37_knn_bruteforce")(spark, sfDir)
      .select($"query_id".as[Long], $"neighbor".as[Long]).collect()
    val iv = VectorOps.defs("q40_ann_ivf")(spark, sfDir)
      .select($"query_id".as[Long], $"neighbor".as[Long]).collect().toSet
    val expected = ex.groupBy(_._1).map { case (q, rows) =>
      val k = rows.length.toLong
      val m = rows.count(iv.contains).toLong
      (q, k, m, m * 1000 / k)
    }.toSeq.sortBy(_._1)
    val got = VectorOps.defs("q125_ann_recall")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val (all, per) = got.partition(_._1 == -1L)
    assert(per == expected)
    assert(all.head._2 == expected.map(_._2).sum)
    assert(all.head._3 == expected.map(_._3).sum)
    // recall is a proper fraction
    got.foreach { case (_, k, m, pm) => assert(m <= k && pm <= 1000) }
  }

  test("q149: Lloyd rounds monotonically improve until the stop rule fires") {
    import spark.implicits._
    val rows = VectorOps.defs("q149_kmeans_convergence")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // the loop reports iter 0 (seeds) plus >= 1 learned rounds, capped
    assert(rows.map(_._1) == (0L until rows.length.toLong),
      "iterations are contiguous from 0")
    assert(rows.length >= 2 && rows.length <= 5)
    rows.foreach { r =>
      assert(r._3 == rows.head._3, "every vector stays assigned every round")
      assert(r._2 <= 16)
    }
    // every round before the last strictly improved by >= minImprove
    // (else the loop would have stopped there); the LAST round either
    // hit the iteration cap (still improving) or fired the convergence
    // stop (improvement < 1 — floor-quantized means may even tick up)
    rows.sliding(2).toSeq.dropRight(1).foreach { case Seq(a, b) =>
      assert(a._5 - b._5 >= 1L,
        s"non-final round must strictly improve: ${a._5} -> ${b._5}")
    }
    assert(rows(1)._5 < rows(0)._5,
      "on the driver corpus the first step strictly improves")
  }
}
