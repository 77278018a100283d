package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorOps

/** q171 SemDeDup: driver brute force over the converged clustering
  * (assignment, intra-cell pairs, exact-integer cosine threshold,
  * less-central drop rule) compared row-exact, plus a constructed
  * corpus pinning the semantics — a planted duplicate is caught and
  * the less-central copy dropped, and a cross-CELL duplicate is NOT a
  * candidate (the cluster-bounded recall cut SemDeDup accepts by
  * design).
  */
class SemDedupSpec extends SparkSpec {

  private def d2(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
  private def dot(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("q171 equals a driver brute force over the converged clustering") {
    import spark.implicits._
    val got = VectorOps.defs("q171_semdedup_lloyd")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val emb = VectorOps.quantized(spark, sfDir)
    val seeds = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"qv".as("cq"))
    val (learned, _) = VectorOps.lloydTrain(emb, seeds,
      VectorOps.LloydMaxIters, VectorOps.LloydMinImprove)
    val cents = learned.select($"cid".cast("long"), $"cq")
      .as[(Long, Seq[Long])].collect()
    val vecs = emb.as[(Long, Seq[Long])].collect()
    val assigned = vecs.map { case (id, qv) =>
      val (cid, cq) = cents.minBy { case (c, cq) => (d2(qv, cq), c) }
      (id, cid, d2(qv, cq), dot(qv, qv), qv)
    }
    val pairs = for {
      a <- assigned; b <- assigned
      if a._2 == b._2 && a._1 < b._1
      dd = dot(a._5, b._5)
      if dd > 0 &&
        BigInt(dd) * dd * 25 >= BigInt(a._4) * b._4 * 4
    } yield (a, b)
    val dropIds = pairs.map { case (a, b) =>
      if (a._3 > b._3 || (a._3 == b._3 && a._1 > b._1)) a._1 else b._1
    }.toSet
    val nPairs = pairs.flatMap(p => Seq(p._1._1, p._2._1))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val want = assigned.map { case (id, cid, _, _, _) =>
      (cid, id, nPairs.getOrElse(id, 0L),
        if (dropIds.contains(id)) 1L else 0L)
    }.sortBy(v => (v._1, v._2)).toSeq
    assert(got === want)
    assert(got.exists(_._4 == 1L), "fixture should drop something")
    assert(got.count(_._4 == 1L) < got.length / 2,
      "drops should be the minority at this threshold")
  }

  test("a planted duplicate drops its less-central copy; cross-cell twins are not candidates") {
    import spark.implicits._
    // cell 0: a (close to centroid) and b = 2a (same direction, cos = 1,
    // farther out), plus an orthogonal bystander c; cell 1: d = a's twin
    // but in ANOTHER cell — cluster-bounded candidates must ignore it
    val member = Seq(
      (10L, 0L, 1L, 4L, Seq(2L, 0L, 0L, 0L)),
      (11L, 0L, 9L, 16L, Seq(4L, 0L, 0L, 0L)),
      (12L, 0L, 2L, 25L, Seq(0L, 5L, 0L, 0L)),
      (20L, 1L, 0L, 9L, Seq(3L, 0L, 0L, 0L))
    ).toDF("vec_id", "cid", "dist", "n2", "qv")
    val got = VectorOps.semDedupVerdicts(member)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 10L, 1L, 0L),   // keeper: nearer its centroid
      (0L, 11L, 1L, 1L),   // the less-central duplicate drops
      (0L, 12L, 0L, 0L),   // orthogonal: cosine 0, no pair
      (1L, 20L, 0L, 0L)))  // cross-cell twin: never a candidate
  }

  // ---- q181: the cap-bounded production posture ----

  /** Driver replay of [[VectorOps.cappedCells]]: recursive MEDIAN
    * bisection of over-cap cells along the central→peripheral chord —
    * integer projections, value-split at the floor(n/2)-ranked
    * projection, floor-mean leaf centroids, path-string cell ids.
    */
  private def capRec(init: Seq[(Long, String, Long)],
      vecs: Map[Long, Seq[Long]], cap: Long,
      maxRounds: Int): Seq[(Long, String, Long)] = {
    var state = init
    var round = 0
    while (round < maxRounds &&
        state.groupBy(_._2).exists(_._2.size > cap)) {
      val byCell = state.groupBy(_._2)
      val hot = byCell.filter(_._2.size > cap).keySet
      val kept = state.filterNot(m => hot.contains(m._2))
      val split = hot.toSeq.flatMap { cell =>
        val members = byCell(cell)
        val s0 = vecs(members.minBy(m => (m._3, m._1))._1)
        val s1 = vecs(members.maxBy(m => (m._3, m._1))._1)
        val ax = s1.zip(s0).map { case (a, b) => a - b }
        val pj = members.map(m => (m._1, dot(vecs(m._1), ax)))
        val ranked = pj.sortBy(identity => (identity._2, identity._1))
        val t = ranked(members.size / 2 - 1)._2
        val halves = pj.map { case (id, p) =>
          (id, if (p > t) 1 else 0) }
        val means = halves.groupBy(_._2).map { case (sub, ms) =>
          val n = ms.size
          sub -> (0 until 64).map(i => math.floor(
            ms.map(m => vecs(m._1)(i)).sum.toDouble / n).toLong)
        }
        halves.map { case (id, sub) =>
          (id, s"$cell/$sub", d2(vecs(id), means(sub)))
        }
      }
      state = kept ++ split
      round += 1
    }
    assert(!state.groupBy(_._2).exists(_._2.size > cap),
      s"driver replay: cap $cap unenforced after $maxRounds rounds")
    state
  }

  test("q181 equals a driver brute force of collapse + capped recursion") {
    import spark.implicits._
    val got = VectorOps.defs("q181_semdedup_capped")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val emb = VectorOps.quantized(spark, sfDir)
    val seeds = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"qv".as("cq"))
    val (learned, _) = VectorOps.lloydTrain(emb, seeds,
      VectorOps.LloydMaxIters, VectorOps.LloydMinImprove)
    val cents = learned.select($"cid".cast("long"), $"cq")
      .as[(Long, Seq[Long])].collect()
    val vecs = emb.as[(Long, Seq[Long])].collect().toMap
    // exact-duplicate collapse: representative = min id per vector
    val groups = vecs.groupBy(_._2).map { case (_, ms) =>
      val ids = ms.keys.toSeq.sorted
      ids.min -> ids
    }
    val repOf = groups.flatMap { case (rep, ids) =>
      ids.map(_ -> rep) }
    val init = groups.keys.toSeq.map { id =>
      val qv = vecs(id)
      val (cid, cq) = cents.minBy { case (c, cq) => (d2(qv, cq), c) }
      (id, cid.toString, d2(qv, cq))
    }
    val leaves = capRec(init, vecs, VectorOps.SemDedupCap,
      VectorOps.SemDedupMaxRounds)
    // the recursion must have actually split on the fixture — a cap
    // that never triggers proves only the identity path
    assert(leaves.exists(_._2.contains("/")),
      "fixture must exercise at least one split round")
    val pairs = for {
      a <- leaves; b <- leaves
      if a._2 == b._2 && a._1 < b._1
      dd = dot(vecs(a._1), vecs(b._1))
      if dd > 0 && BigInt(dd) * dd * 25 >=
        BigInt(dot(vecs(a._1), vecs(a._1))) *
          dot(vecs(b._1), vecs(b._1)) * 4
    } yield (a, b)
    val dropIds = pairs.map { case (a, b) =>
      if (a._3 > b._3 || (a._3 == b._3 && a._1 > b._1)) a._1 else b._1
    }.toSet
    val nPairs = pairs.flatMap(p => Seq(p._1._1, p._2._1))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val cellOfRep = leaves.map(l => l._1 -> l._2).toMap
    val want = vecs.keys.toSeq.map { id =>
      val rep = repOf(id)
      (cellOfRep(rep), id, rep, groups(rep).size.toLong,
        nPairs.getOrElse(rep, 0L),
        if (id != rep || dropIds.contains(rep)) 1L else 0L)
    }.sortBy(v => (v._1, v._2))
    assert(got === want)
    // the linear pair-mass contract the cap buys (over distinct reps)
    val leafSizes = leaves.groupBy(_._2).map(_._2.size.toLong)
    assert(leafSizes.max <= VectorOps.SemDedupCap)
    assert(leafSizes.map(c => c * (c - 1) / 2).sum <=
      VectorOps.SemDedupCap * leaves.size)
  }

  test("capped recursion: copies collapse and drop, leaves fit, exhausted rounds fail loudly") {
    import spark.implicits._
    def vec(seed: Int): Seq[Long] = {
      val r = new scala.util.Random(seed)
      Seq.fill(64)(r.nextInt(200).toLong)
    }
    // one tight over-cap cluster around base (60 members incl. 3 exact
    // copies of member 7), plus a far bystander cluster that fits
    val base = vec(1)
    val members = (0 until 60).map { i =>
      (i.toLong, base.zipWithIndex.map { case (x, j) => x + vec(i)(j) % 3 })
    }
    val dup = members(7)._2
    val fixed = members.map { case (id, qv) =>
      (id, if (id == 20L || id == 21L) dup else qv) }
    // offsets stay small enough that dot²·25 holds in int64 (the
    // verdict arithmetic is ANSI-pinned and must not overflow)
    val far = (100 until 106).map(i =>
      (i.toLong, vec(100 + i).map(_ + 1500L)))
    val embAll = (fixed ++ far).toDF("vec_id", "qv")
    val learned = Seq((0L, fixed.head._2), (1L, far.head._2))
      .toDF("cid", "cq")
    // collapse, then split the distinct representatives
    val groups = embAll.groupBy($"qv")
      .agg(min($"vec_id").as("rep_id"), count(lit(1)).as("n_copies"))
    val reps = groups.select($"rep_id".as("vec_id"), $"qv")
    val leaves = VectorOps.cappedCells(reps, learned, cap = 8L,
        maxRounds = 16)
      .as[(Long, String, Long)].collect().toSeq
    val byCell = leaves.groupBy(_._2)
    assert(byCell.values.forall(_.size <= 8),
      byCell.view.mapValues(_.size).toMap)
    assert(leaves.exists(_._2.count(_ == '/') >= 2),
      "the 58-rep cluster needs at least depth-2 splits at cap 8")
    // the verdict core still flags near-duplicates within a leaf, and
    // the collapsed copies drop by group arithmetic in the entry — the
    // representative of the trio is rep 7 (min id of {7, 20, 21})
    val v = VectorOps.cappedCells(reps, learned, 8L, 16)
      .join(reps, "vec_id")
      .withColumn("n2", graft.functions.VectorMath.dotLong($"qv", $"qv"))
      .select($"vec_id", $"cell", $"dist", $"n2", $"qv")
    val verdicts = VectorOps.semDedupVerdictsOn(v, "cell")
      .as[(String, Long, Long, Long)].collect()
    assert(verdicts.count(_._2 == 7L) === 1 &&
      !verdicts.exists(r => r._2 == 20L || r._2 == 21L),
      "copies must not appear among the split representatives")
    // zero rounds with an over-cap cell: the bound fails loudly instead
    // of quietly shipping an uncapped clustering
    val ex = intercept[IllegalStateException] {
      VectorOps.cappedCells(reps, learned, cap = 8L, maxRounds = 0)
        .collect()
    }
    assert(ex.getMessage.contains("over the cap"))
  }

  test("capped recursion invariants hold over randomized corpora") {
    import spark.implicits._
    // seeded randomized cases (the ScalaCheck discipline at Spark-job
    // granularity): random cluster structure, random cap — the
    // recursion must either enforce the cap on every leaf or fail
    // loudly; identical vectors must co-land; reruns must replay
    // bit-for-bit
    Seq(101, 202, 303).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val cap = 4L + rnd.nextInt(12)
      val nPts = 40 + rnd.nextInt(120)
      val nClusters = 1 + rnd.nextInt(4)
      val centers = Seq.fill(nClusters)(
        Seq.fill(64)(rnd.nextInt(1200).toLong))
      val pts = (0 until nPts).map { i =>
        val c = centers(rnd.nextInt(nClusters))
        (i.toLong, c.map(_ + rnd.nextInt(7) - 3))
      }
      val copies = (0 until 10).map(k =>
        (1000L + k, pts(rnd.nextInt(nPts))._2))
      val all = pts ++ copies
      val emb = all.toDF("vec_id", "qv").localCheckpoint(true)
      val learned = Seq((0L, pts.head._2), (1L, pts.last._2))
        .toDF("cid", "cq")
      try {
        val leaves = VectorOps.cappedCells(emb, learned, cap, 16)
          .as[(Long, String, Long)].collect().toSeq
        assert(leaves.map(_._1).sorted === all.map(_._1).sorted,
          s"seed $seed: members lost or duplicated")
        leaves.groupBy(_._2).foreach { case (cell, ms) =>
          assert(ms.size <= cap, s"seed $seed: leaf $cell over cap $cap")
        }
        val cellOf = leaves.map(l => l._1 -> l._2).toMap
        copies.foreach { case (cid2, qv) =>
          val twin = all.find(p => p._2 == qv && p._1 != cid2).get._1
          assert(cellOf(cid2) === cellOf(twin),
            s"seed $seed: identical vectors $cid2/$twin split apart")
        }
        val again = VectorOps.cappedCells(emb, learned, cap, 16)
          .as[(Long, String, Long)].collect().toSeq
        assert(again.sorted === leaves.sorted,
          s"seed $seed: rerun drifted")
      } catch {
        case e: IllegalStateException =>
          assert(e.getMessage.contains("over the cap"),
            s"seed $seed: unexpected failure ${e.getMessage}")
      }
    }
  }
}
