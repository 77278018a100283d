package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, VectorOps}

/** Model-based randomized consistency check of the mutable index: a
  * seeded pseudo-random interleaving of ingest / delete / compact /
  * splitCells runs against a driver-side model of the LOGICAL contents
  * (ids -> vectors, minus deletes), and after EVERY op the store must
  * agree with the model on four invariants that hold under any policy:
  *
  *  - contents: masked postings == model (ids and vectors bit-equal,
  *    nothing duplicated across cells, nothing lost by a rewrite)
  *  - serve consistency: the stored serve == a driver re-ranking that
  *    uses the store's OWN routing state (its centroids and its
  *    vec->cid homing), so the probe/rank/mask pipeline cannot drift
  *    from the store it reads — without the model having to predict
  *    the 2-means a split runs
  *  - epoch pinning: a serve captured at a pinned early epoch replays
  *    bit-identically through every later mutation (retention widened)
  *  - post-compact: generations fold to 0 and the mask is empty
  *
  * This is the property-test complement to the per-op IvfIndexSpec
  * cases: those pin each mutation in isolation; this drives the
  * cross-products (delete-then-split, split-then-ingest,
  * compact-mid-sequence, double deletes) a deployment actually hits.
  */
class IndexModelSpec extends SparkSpec {

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_model_spec/$name"

  private type Vec = Seq[Long]

  private def d2(a: Vec, b: Vec): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private def storeContents(dir: String): Map[Long, (Long, Vec)] = {
    import spark.implicits._
    val snap = IvfIndex.postings(spark, dir)
      .select($"vec_id", $"cid".cast("long"), $"qv")
      .as[(Long, Long, Seq[Long])].collect()
    assert(snap.map(_._1).distinct.length === snap.length,
      "a vector appears in more than one cell")
    snap.map { case (id, cid, qv) => id -> (cid, qv) }.toMap
  }

  private def maskedContents(dir: String,
      deleted: Set[Long]): Map[Long, (Long, Vec)] =
    storeContents(dir).filter { case (id, _) => !deleted.contains(id) }

  private def driverServe(dir: String, contents: Map[Long, (Long, Vec)],
      queries: Seq[(Long, Vec)], probes: Int = 2, k: Int = 5)
      : Set[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    val cents = IvfIndex.centroids(spark, dir)
      .select($"cid".cast("long"), $"cq").as[(Long, Seq[Long])]
      .collect().sortBy(_._1)
    val cellSize = contents.values.groupBy(_._1)
      .map { case (c, xs) => c -> xs.size.toLong }
    queries.flatMap { case (qid, qv) =>
      val probed = cents.sortBy { case (c, cq) => (d2(qv, cq), c) }
        .take(probes).map(_._1).toSet
      contents.toSeq
        .filter { case (id, (c, _)) => id != qid && probed.contains(c) }
        .map { case (id, (c, v)) => (id, c, d2(v, qv)) }
        .sortBy { case (id, _, dist) => (dist, id) }.take(k)
        .zipWithIndex.map { case ((id, c, dist), r) =>
          (qid, (r + 1).toLong, id, dist, cellSize(c))
        }
    }.toSet
  }

  private def storeServe(dir: String,
      queries: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    IvfIndex.serve(spark, dir, queries)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
  }

  test("random mutation interleavings keep the store consistent with the model") {
    import spark.implicits._
    spark.conf.set("spark.graft.index.retainEpochs", "64")
    try {
      val emb = VectorOps.quantized(spark, sfDir)
        .as[(Long, Seq[Long])].collect()
      val queries = emb.filter(_._1 % 100 == 0)
      val queryDf = queries.toSeq.toDF("vec_id", "qv")

      Seq(7L, 23L).foreach { seed =>
        val rng = new scala.util.Random(seed)
        val dir = tmp(s"seed$seed")
        val base = emb.filter(_._1 % 3 != 0)
        val pool = scala.collection.mutable.Queue(
          emb.filter(_._1 % 3 == 0).grouped(40).toSeq: _*)
        IvfIndex.build(base.toSeq.toDF("vec_id", "qv"), dir)
        var live = base.map(_._1).toSet
        var deleted = Set.empty[Long]
        var nextGen = 1L
        val pinnedServe = storeServe(dir, queryDf)
        val pinnedEpoch = 1L

        (1 to 12).foreach { step =>
          val op = rng.nextInt(4)
          op match {
            case 0 if pool.nonEmpty => // ingest a fresh batch
              val batch = pool.dequeue()
              IvfIndex.addBatch(spark, dir,
                batch.toSeq.toDF("vec_id", "qv"), gen = nextGen)
              nextGen += 1
              live = live ++ batch.map(_._1)
            case 1 if (live -- deleted).nonEmpty => // delete a random slice
              val victims = (live -- deleted).toSeq.sorted
                .filter(_ => rng.nextInt(5) == 0).take(60)
              if (victims.nonEmpty) {
                IvfIndex.delete(spark, dir,
                  victims.toDF("vec_id"))
                deleted = deleted ++ victims
              }
            case 2 => // compact: physical state folds, content must not move
              IvfIndex.compact(spark, dir)
              live = live -- deleted
              deleted = Set.empty
              val post = IvfIndex.postings(spark, dir)
              assert(post.filter($"gen" =!= 0L).count() === 0L,
                s"step $step: generations did not fold")
            case _ => // split (no-op when nothing flags) — policy's call
              IvfIndex.splitCells(spark, dir)
          }
          // contents == model, masks applied, vectors bit-equal
          val want = emb.filter(e =>
              live.contains(e._1) && !deleted.contains(e._1))
            .map { case (id, v) => id -> v }.toMap
          val got = maskedContents(dir, deleted)
          assert(got.keySet === want.keySet,
            s"seed $seed step $step op $op: content id drift")
          got.foreach { case (id, (_, v)) => assert(v == want(id),
            s"seed $seed step $step: vector bytes drifted for $id") }
          // stored serve == driver serve over the store's own routing
          assert(storeServe(dir, queryDf)
              === driverServe(dir, got, queries.toSeq),
            s"seed $seed step $step op $op: serve drift")
          // the pinned epoch still replays bit-identically
          assert(IvfIndex.serveAt(spark, dir, pinnedEpoch, queryDf)
              .as[(Long, Long, Long, Long, Long)].collect().toSet
              === pinnedServe,
            s"seed $seed step $step: pinned-epoch replay drifted")
        }
      }
    } finally spark.conf.unset("spark.graft.index.retainEpochs")
  }

  /** The round-12 soak: every mutator the store grew — ingest, delete,
    * compact, split, mergeFrom (shard consolidation), cloneAt (fork +
    * isolation) — interleaved by seed over ≥ 120 raw-store steps, with
    * contents checked against the driver model after EVERY step, serve
    * consistency and a TIME-TRAVEL READ AT A RANDOM RETAINED EPOCH
    * (against the serve recorded when that epoch was current) probed
    * periodically; plus an 80-step PQ-store soak interleaving ingest /
    * delete / compact / retrainPq with pinned-epoch ADC stability
    * across codebook version flips and exact-distance verification of
    * the refine tier.
    */
  test("full-lifecycle soak: all mutators, random epoch replays, 200 seeded steps") {
    import spark.implicits._
    spark.conf.set("spark.graft.index.retainEpochs", "512")
    try {
      val emb = VectorOps.quantized(spark, sfDir)
        .as[(Long, Seq[Long])].collect()
      val vecsOf = emb.toMap
      val queries = emb.filter(_._1 % 100 == 0)
      val queryDf = queries.toSeq.toDF("vec_id", "qv")
      var totalSteps = 0

      Seq(11L, 42L).foreach { seed =>
        val rng = new scala.util.Random(seed)
        val dir = tmp(s"soak$seed")
        val base = emb.filter(_._1 % 3 != 0)
        val pool = scala.collection.mutable.Queue(
          emb.filter(_._1 % 3 == 0).grouped(12).toSeq: _*)
        IvfIndex.build(base.toSeq.toDF("vec_id", "qv"), dir)
        var live = base.map(_._1).toSet
        var deleted = Set.empty[Long]
        var nextGen = 1L
        var cloneN = 0
        // epoch -> the serve recorded while that epoch was current
        val history = scala.collection.mutable.Buffer[
          (Long, Set[(Long, Long, Long, Long, Long)])]()
        history += IvfIndex.readSnapshot(spark, dir).epoch ->
          storeServe(dir, queryDf)

        (1 to 60).foreach { step =>
          totalSteps += 1
          val op = rng.nextInt(6)
          op match {
            case 0 if pool.nonEmpty => // ingest
              val batch = pool.dequeue()
              IvfIndex.addBatch(spark, dir,
                batch.toSeq.toDF("vec_id", "qv"), gen = nextGen)
              nextGen += 1
              live = live ++ batch.map(_._1)
            case 1 if (live -- deleted).nonEmpty => // delete
              val victims = (live -- deleted).toSeq.sorted
                .filter(_ => rng.nextInt(6) == 0).take(40)
              if (victims.nonEmpty) {
                IvfIndex.delete(spark, dir, victims.toDF("vec_id"))
                deleted = deleted ++ victims
              }
            case 2 => // compact
              IvfIndex.compact(spark, dir)
              live = live -- deleted
              deleted = Set.empty
            case 3 => // split (policy's call; no-op when nothing flags)
              IvfIndex.splitCells(spark, dir)
            case 4 if pool.nonEmpty => // shard merge
              val batch = pool.dequeue()
              val side = tmp(s"soak${seed}_side$step")
              // a shard's id range starts wherever its slice starts
              IvfIndex.build(batch.toSeq.toDF("vec_id", "qv"), side,
                seedSmallest = true)
              // the shard may take its own deletes before consolidating
              val dead = batch.map(_._1)
                .filter(_ => rng.nextInt(4) == 0).toSet
              if (dead.nonEmpty)
                IvfIndex.delete(spark, side, dead.toSeq.toDF("vec_id"))
              IvfIndex.mergeFrom(spark, dir, side, gen = nextGen)
              nextGen += 1
              live = live ++ (batch.map(_._1).toSet -- dead)
            case _ => // clone the CURRENT epoch; verify independence
              val ep = IvfIndex.readSnapshot(spark, dir).epoch
              val cl = tmp(s"soak${seed}_clone$step")
              cloneN += 1
              IvfIndex.cloneAt(spark, dir, ep, cl)
              val want = emb.filter(e =>
                  live.contains(e._1) && !deleted.contains(e._1))
                .map(_._1).toSet
              assert(storeContents(cl).keySet === want,
                s"seed $seed step $step: clone contents drift")
              // mutating the clone must not touch the source
              val victim = want.headOption.toSeq
              if (victim.nonEmpty)
                IvfIndex.delete(spark, cl, victim.toDF("vec_id"))
              assert(maskedContents(dir, deleted).keySet === want,
                s"seed $seed step $step: clone mutation leaked to source")
          }
          // contents == model after EVERY step
          val want = emb.filter(e =>
              live.contains(e._1) && !deleted.contains(e._1))
            .map { case (id, v) => id -> v }.toMap
          val got = maskedContents(dir, deleted)
          assert(got.keySet === want.keySet,
            s"seed $seed step $step op $op: content id drift")
          got.foreach { case (id, (_, v)) => assert(v == want(id),
            s"seed $seed step $step: vector bytes drifted for $id") }
          // serve + random-retained-epoch replay every 4th step
          if (step % 4 == 0) {
            val cur = storeServe(dir, queryDf)
            assert(cur === driverServe(dir, got, queries.toSeq),
              s"seed $seed step $step op $op: serve drift")
            history += IvfIndex.readSnapshot(spark, dir).epoch -> cur
            val (ep, wantServe) = history(rng.nextInt(history.size))
            assert(IvfIndex.serveAt(spark, dir, ep, queryDf)
                .as[(Long, Long, Long, Long, Long)].collect().toSet
                === wantServe,
              s"seed $seed step $step: epoch $ep replay drifted")
          }
        }
        assert(cloneN > 0, s"seed $seed: the soak should exercise clones")
      }

      // PQ-store soak: ingest / delete / compact / retrain, with
      // pinned-epoch ADC stability across codebook version flips and
      // exact-distance verification of the refine tier
      val corpusDf = emb.toSeq.toDF("vec_id", "qv").localCheckpoint(true)
      val rng = new scala.util.Random(5L)
      val dir = tmp("soakpq")
      val base = emb.filter(_._1 % 3 != 0)
      val pool = scala.collection.mutable.Queue(
        emb.filter(_._1 % 3 == 0).grouped(20).toSeq: _*)
      IvfIndex.buildPq(base.toSeq.toDF("vec_id", "qv"), dir)
      var live = base.map(_._1).toSet
      var deleted = Set.empty[Long]
      var nextGen = 1L
      var retrains = 0
      val pinnedEpoch = 1L
      val pinnedAdc = IvfIndex.servePq(spark, dir, queryDf)
        .collect().toSeq
      (1 to 80).foreach { step =>
        totalSteps += 1
        rng.nextInt(5) match {
          case 0 if pool.nonEmpty =>
            val batch = pool.dequeue()
            IvfIndex.addBatchPq(spark, dir,
              batch.toSeq.toDF("vec_id", "qv"), gen = nextGen)
            nextGen += 1
            live = live ++ batch.map(_._1)
          case 1 if (live -- deleted).nonEmpty =>
            val victims = (live -- deleted).toSeq.sorted
              .filter(_ => rng.nextInt(6) == 0).take(30)
            if (victims.nonEmpty) {
              IvfIndex.delete(spark, dir, victims.toDF("vec_id"))
              deleted = deleted ++ victims
            }
          case 2 =>
            IvfIndex.compact(spark, dir)
            live = live -- deleted
            deleted = Set.empty
          case 3 if step % 16 == 0 => // retrain is reindex-cadence work
            IvfIndex.retrainPq(spark, dir, corpusDf)
            live = live -- deleted
            deleted = Set.empty
            retrains += 1
          case _ => ()
        }
        val wantIds = live -- deleted
        val gotIds = IvfIndex.liveContents(spark, dir)
          .select($"vec_id").as[Long].collect().toSet
        assert(gotIds === wantIds, s"pq step $step: live id drift")
        if (step % 8 == 0) {
          // refine tier: exact distances on full vectors, ordered,
          // live-only
          val ref = IvfIndex.servePqRefine(spark, dir, queryDf, corpusDf)
            .as[(Long, Long, Long, Long)].collect().toSeq
          ref.groupBy(_._1).foreach { case (qid, rows) =>
            val sorted = rows.sortBy(_._2)
            sorted.foreach { case (_, _, nb, dist) =>
              assert(wantIds.contains(nb), s"pq step $step: dead $nb served")
              assert(dist === d2(vecsOf(nb), vecsOf(qid)),
                s"pq step $step: refine distance drift for $nb")
            }
            assert(sorted.map(r => (r._4, r._3)) ===
              sorted.map(r => (r._4, r._3)).sorted,
              s"pq step $step: refine rank order broken for $qid")
          }
          // the pinned pre-mutation epoch replays bit-identically even
          // across retrains (its codebook version is its own)
          assert(IvfIndex.servePqAt(spark, dir, pinnedEpoch, queryDf)
              .collect().toSeq === pinnedAdc,
            s"pq step $step: pinned ADC replay drifted")
        }
      }
      assert(retrains > 0, "the PQ soak should exercise retrains")
      assert(totalSteps >= 200, s"soak ran only $totalSteps steps")
    } finally spark.conf.unset("spark.graft.index.retainEpochs")
  }

  // ---------- labeled store ----------

  /** id -> (cid, label, qv) over the RAW postings (masks applied by the
    * caller); also asserts every row still carries a label and no id
    * appears in two cells — the invariants a label-blind rewrite breaks.
    */
  private def labeledContents(dir: String): Map[Long, (Long, Long, Vec)] = {
    import spark.implicits._
    val rows = IvfIndex.postings(spark, dir)
      .select($"vec_id", $"cid".cast("long"), $"label".cast("long"), $"qv")
      .as[(Long, Long, Long, Seq[Long])].collect()
    assert(rows.map(_._1).distinct.length === rows.length,
      "a vector appears in more than one cell")
    rows.map { case (id, cid, l, qv) => id -> (cid, l, qv) }.toMap
  }

  private def driverServeLabeled(dir: String,
      contents: Map[Long, (Long, Long, Vec)],
      queries: Seq[(Long, Vec, Long)], probes: Int = 2, k: Int = 5)
      : Set[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    val cents = IvfIndex.centroids(spark, dir)
      .select($"cid".cast("long"), $"cq").as[(Long, Seq[Long])].collect()
    queries.flatMap { case (qid, qv, ql) =>
      val probed = cents.sortBy { case (c, cq) => (d2(qv, cq), c) }
        .take(probes).map(_._1).toSet
      contents.toSeq
        .filter { case (id, (c, l, _)) =>
          id != qid && l == ql && probed.contains(c) }
        .map { case (id, (_, _, v)) => (id, d2(v, qv)) }
        .sortBy { case (id, dist) => (dist, id) }.take(k)
        .zipWithIndex.map { case ((id, dist), r) =>
          (qid, ql, id, dist, (r + 1).toLong) }
    }.toSet
  }

  private def storeServeLabeled(dir: String,
      queryDf: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    IvfIndex.serveLabeled(spark, dir, queryDf)
      .select($"query_id", $"label", $"neighbor", $"dist", $"rank")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
  }

  test("labeled splitCells carries labels through the hot-cell rewrite") {
    import spark.implicits._
    val dir = tmp("labsplit")
    // 16 spread seeds; 30 extra members packed into seed 0's cell so it
    // holds >1/8 of the corpus and flags for split
    val vecs: Seq[(Long, Vec, Long)] =
      (0L until 16L).map(i => (i, Seq(i * 1000L, 0L, 0L, 0L), i % 4)) ++
        (16L until 46L).map(i => (i, Seq(i % 3, i % 5, 0L, 0L), i % 4)) ++
        (46L until 100L).map(i =>
          (i, Seq((i % 16) * 1000L + 17L, i % 7, 0L, 0L), i % 4))
    IvfIndex.buildLabeled(vecs.toDF("vec_id", "qv", "label"), dir)
    val before = labeledContents(dir)
    val report = IvfIndex.splitCells(spark, dir)
    // the hot cell must actually have split (fresh cids past the seeds)
    assert(IvfIndex.centroids(spark, dir)
      .select(max($"cid".cast("long"))).head().getLong(0) >= 16L,
      "fixture did not trigger a split — the regression would not bite")
    val after = labeledContents(dir) // asserts label column + no dup ids
    assert(after.keySet === before.keySet, "split lost or invented ids")
    after.foreach { case (id, (_, l, v)) =>
      assert((l, v) === (before(id)._2, before(id)._3),
        s"split drifted label/vector for $id") }
    // the labeled layout survives: every split-cell posting sits under
    // cid=/label=/gen= and the filtered serve still routes
    val queries = vecs.filter(_._1 % 10 == 0)
    assert(storeServeLabeled(dir, queries.toDF("vec_id", "qv", "label"))
      === driverServeLabeled(dir, after, queries),
      "filtered serve drifted after the labeled split")
    assert(report.columns.contains("needs_split"))
  }

  /** The labeled twin of the all-mutator soak: addBatchLabeled / delete
    * / compact / splitCells / mergeFromLabeled (shard built with
    * buildLabeled's seedSmallest rule — the labeled twin of the crash
    * the raw soak caught) interleaved by seed, with labeled contents
    * checked against the driver model and the FILTERED serve checked
    * against a same-label driver re-ranking after every step.
    */
  test("labeled-store soak: all labeled mutators keep labels and serves intact") {
    import spark.implicits._
    withIndexRetention(64) {
      val emb = VectorOps.quantizedLabeled(spark, sfDir)
        .as[(Long, Seq[Long], Long)].collect()
      val queries = emb.filter(_._1 % 100 == 0).toSeq
      val queryDf = queries.toDF("vec_id", "qv", "label")

      Seq(11L, 29L).foreach { seed =>
        val rng = new scala.util.Random(seed)
        val dir = tmp(s"lab$seed")
        val base = emb.filter(_._1 % 3 != 0)
        val pool = scala.collection.mutable.Queue(
          emb.filter(_._1 % 3 == 0).grouped(30).toSeq: _*)
        IvfIndex.buildLabeled(base.toSeq.toDF("vec_id", "qv", "label"), dir)
        var live = base.map(_._1).toSet
        var deleted = Set.empty[Long]
        var nextGen = 1L
        var merges = 0

        (1 to 14).foreach { step =>
          val op = rng.nextInt(5)
          op match {
            case 0 if pool.nonEmpty =>
              val b = pool.dequeue()
              IvfIndex.addBatchLabeled(spark, dir,
                b.toSeq.toDF("vec_id", "qv", "label"), gen = nextGen)
              nextGen += 1; live = live ++ b.map(_._1)
            case 1 if (live -- deleted).nonEmpty =>
              val victims = (live -- deleted).toSeq.sorted
                .filter(_ => rng.nextInt(4) == 0).take(50)
              if (victims.nonEmpty) {
                IvfIndex.delete(spark, dir, victims.toDF("vec_id"))
                deleted = deleted ++ victims
              }
            case 2 =>
              IvfIndex.compact(spark, dir)
              live = live -- deleted; deleted = Set.empty
            case 3 =>
              IvfIndex.splitCells(spark, dir)
            case _ if pool.nonEmpty =>
              val b = pool.dequeue()
              val shard = tmp(s"lab${seed}_shard$step")
              IvfIndex.buildLabeled(
                b.toSeq.toDF("vec_id", "qv", "label"), shard,
                seedSmallest = true)
              IvfIndex.mergeFromLabeled(spark, dir, shard, gen = nextGen)
              nextGen += 1; live = live ++ b.map(_._1); merges += 1
            case _ => ()
          }
          val want = emb.filter(e =>
              live.contains(e._1) && !deleted.contains(e._1))
            .map { case (id, v, l) => id -> (l, v) }.toMap
          val got = labeledContents(dir)
            .filter { case (id, _) => !deleted.contains(id) }
          assert(got.keySet === want.keySet,
            s"seed $seed step $step op $op: content id drift")
          got.foreach { case (id, (_, l, v)) =>
            assert((l, v) === want(id),
              s"seed $seed step $step: label/vector drift for $id") }
          assert(storeServeLabeled(dir, queryDf)
              === driverServeLabeled(dir, got, queries),
            s"seed $seed step $step op $op: filtered-serve drift")
        }
        assert(merges > 0, s"seed $seed: soak never exercised the merge")
      }
    }
  }

  // ---------- binary (1-bit) tier: the same model discipline ----------

  private def packWords(v: Seq[Long]): (Long, Long) = {
    var w0 = 0L; var w1 = 0L
    (0 until 32).foreach { i =>
      if (v(i) > 0) w0 |= 1L << i
      if (v(i + 32) > 0) w1 |= 1L << i
    }
    (w0, w1)
  }

  /** Driver replica of the two-stage binary serve: Hamming shortlist
    * of `width` by (ham asc, id asc) over the model contents, exact
    * L2 re-rank, top-k by (dist asc, id asc).
    */
  private def driverBinaryServe(contents: Map[Long, Vec],
      queries: Seq[(Long, Vec)], width: Int = 20, k: Int = 5)
      : Set[(Long, Long, Long, Long)] = {
    queries.flatMap { case (qid, qv) =>
      val (qw0, qw1) = packWords(qv)
      val short = contents.toSeq.filter(_._1 != qid)
        .map { case (id, v) =>
          val (w0, w1) = packWords(v)
          (java.lang.Long.bitCount(w0 ^ qw0)
            + java.lang.Long.bitCount(w1 ^ qw1), id, v)
        }
        .sortBy { case (h, id, _) => (h, id) }.take(width)
      short.map { case (_, id, v) => (id, d2(v, qv)) }
        .sortBy { case (id, dist) => (dist, id) }.take(k)
        .zipWithIndex
        .map { case ((id, dist), r) => (qid, (r + 1).toLong, id, dist) }
    }.toSet
  }

  private def binStoreServe(dir: String,
      queries: org.apache.spark.sql.DataFrame, cached: Boolean,
      epoch: Option[Long] = None): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val qs = graft.operators.VectorOps.binaryCodes(queries)
      .select($"vec_id".as("query_id"), $"qv".as("q_qv"),
        $"w0".as("qw0"), $"w1".as("qw1"))
    graft.operators.BinaryStore
      .serve(spark, dir, qs, k = 5, width = 20, cached = cached,
        epoch = epoch)
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  /** The round-13 extension: [[graft.operators.BinaryStore]] under the
    * same seeded-interleaving model check as the index — ingest
    * (including a REPLAYED generation), delete, compact, vacuum — with
    * contents, both serve paths (the cached one exercising the
    * epoch-keyed refresh across every commit), and a random retained
    * epoch's time-travel replay verified after every step.
    */
  test("binary store: random mutation interleavings match the driver model") {
    import spark.implicits._
    withIndexRetention(512) {
      val emb = VectorOps.quantized(spark, sfDir)
        .as[(Long, Seq[Long])].collect()
      val queries = emb.filter(_._1 % 100 == 0)
      val queryDf = queries.toSeq.toDF("vec_id", "qv")

      Seq(3L, 31L).foreach { seed =>
        val rng = new scala.util.Random(seed)
        val dir = tmp(s"bin$seed")
        val base = emb.filter(_._1 % 3 != 0)
        val pool = scala.collection.mutable.Queue(
          emb.filter(_._1 % 3 == 0).grouped(25).toSeq: _*)
        graft.operators.BinaryStore.build(
          base.toSeq.toDF("vec_id", "qv"), dir)
        var live = base.map(_._1).toSet
        var deleted = Set.empty[Long]
        var nextGen = 1L
        var committedBatches = Map.empty[Long, Seq[(Long, Seq[Long])]]
        val history = scala.collection.mutable.Buffer[
          (Long, Set[(Long, Long, Long, Long)])]()
        history += 1L -> binStoreServe(dir, queryDf, cached = false)

        (1 to 14).foreach { step =>
          val op = rng.nextInt(5)
          op match {
            case 0 if pool.nonEmpty => // ingest
              val batch = pool.dequeue()
              graft.operators.BinaryStore.addBatch(spark, dir,
                batch.toSeq.toDF("vec_id", "qv"), gen = nextGen)
              committedBatches += nextGen -> batch.toSeq
              nextGen += 1
              live = live ++ batch.map(_._1)
            case 1 if committedBatches.nonEmpty => // ingest REPLAY: no-op
              val (g, b) = committedBatches.toSeq
                .apply(rng.nextInt(committedBatches.size))
              graft.operators.BinaryStore.addBatch(spark, dir,
                b.toDF("vec_id", "qv"), gen = g)
            case 2 if (live -- deleted).nonEmpty => // delete
              val victims = (live -- deleted).toSeq.sorted
                .filter(_ => rng.nextInt(5) == 0).take(50)
              if (victims.nonEmpty) {
                graft.operators.BinaryStore.delete(spark, dir,
                  victims.toDF("vec_id"))
                deleted = deleted ++ victims
              }
            case 3 => // compact: fold + physical delete
              graft.operators.BinaryStore.compact(spark, dir)
              live = live -- deleted
              deleted = Set.empty
              val rep = graft.operators.BinaryStore
                .genReport(spark, dir)
                .as[(Long, Long)].collect().toMap
              assert(rep.keySet.subsetOf(Set(0L, -1L)),
                s"seed $seed step $step: generations did not fold: $rep")
            case _ => // vacuum is a metadata no-op on live state
              graft.operators.BinaryStore.vacuum(spark, dir).collect()
          }
          val want = emb.filter(e =>
              live.contains(e._1) && !deleted.contains(e._1)).toMap
          val got = graft.operators.BinaryStore.liveCodes(spark, dir)
            .select($"vec_id", $"w0", $"w1")
            .as[(Long, Long, Long)].collect()
          assert(got.map(_._1).distinct.length === got.length,
            s"seed $seed step $step: duplicate ids in live codes")
          assert(got.map(_._1).toSet === want.keySet,
            s"seed $seed step $step op $op: content id drift")
          got.foreach { case (id, w0, w1) =>
            assert((w0, w1) === packWords(want(id)),
              s"seed $seed step $step: code bytes drifted for $id") }
          val wantServe = driverBinaryServe(want, queries.toSeq)
          val cur = binStoreServe(dir, queryDf, cached = false)
          assert(cur === wantServe,
            s"seed $seed step $step op $op: serve drift")
          // cached path: the epoch-keyed cache must refresh across
          // every commit and match the uncached rows exactly
          assert(binStoreServe(dir, queryDf, cached = true) === wantServe,
            s"seed $seed step $step op $op: CACHED serve drift")
          history += graft.operators.FlatManifest.read(spark, dir).epoch ->
            cur
          val (ep, wantAt) = history(rng.nextInt(history.size))
          assert(binStoreServe(dir, queryDf, cached = false,
              epoch = Some(ep)) === wantAt,
            s"seed $seed step $step: epoch $ep replay drifted")
        }
      }
    }
  }

  /** Same-label serve replica for the LABELED flat store: each query
    * ranks only model rows carrying its label.
    */
  private def driverBinaryServeLabeled(
      contents: Map[Long, (Vec, Long)],
      queries: Seq[(Long, Vec, Long)], width: Int = 20, k: Int = 5)
      : Set[(Long, Long, Long, Long)] = {
    queries.flatMap { case (qid, qv, ql) =>
      val same = contents.collect {
        case (id, (v, l)) if l == ql && id != qid => id -> v }
      driverBinaryServe(same, Seq(qid -> qv), width, k)
    }.toSet
  }

  private def binStoreServeLabeled(dir: String,
      queries: org.apache.spark.sql.DataFrame,
      epoch: Option[Long] = None): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val qs = graft.operators.VectorOps
      .binaryQueriesLabeled(queries)
    graft.operators.BinaryStore
      .serveLabeled(spark, dir, qs, k = 5, width = 20, epoch = epoch)
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  /** Round-14: the LABELED flat store under the model check — labels
    * must survive ingest, replay, delete masking, compaction's fold
    * rewrite, and time travel; every serve is same-label only.
    */
  test("labeled binary store: random interleavings match the same-label model") {
    import spark.implicits._
    withIndexRetention(512) {
      val emb = VectorOps.quantizedLabeled(spark, sfDir)
        .as[(Long, Seq[Long], Long)].collect()
      val queryDf = emb.filter(_._1 % 100 == 0).toSeq
        .toDF("vec_id", "qv", "label")
      val queries = emb.filter(_._1 % 100 == 0)
        .map { case (id, v, l) => (id, v, l) }.toSeq

      val rng = new scala.util.Random(7L)
      val dir = tmp("binlbl7")
      val base = emb.filter(_._1 % 3 != 0)
      val pool = scala.collection.mutable.Queue(
        emb.filter(_._1 % 3 == 0).grouped(25).toSeq: _*)
      graft.operators.BinaryStore.buildLabeled(
        base.toSeq.toDF("vec_id", "qv", "label"), dir)
      var live = base.map(_._1).toSet
      var deleted = Set.empty[Long]
      var nextGen = 1L
      var committedBatches = Map.empty[Long, Seq[(Long, Seq[Long], Long)]]
      val history = scala.collection.mutable.Buffer[
        (Long, Set[(Long, Long, Long, Long)])]()
      history += 1L -> binStoreServeLabeled(dir, queryDf)

      (1 to 12).foreach { step =>
        val op = rng.nextInt(5)
        op match {
          case 0 if pool.nonEmpty =>
            val batch = pool.dequeue()
            graft.operators.BinaryStore.addBatchLabeled(spark, dir,
              batch.toSeq.toDF("vec_id", "qv", "label"), gen = nextGen)
            committedBatches += nextGen -> batch.toSeq
            nextGen += 1
            live = live ++ batch.map(_._1)
          case 1 if committedBatches.nonEmpty => // replay: no-op
            val (g, b) = committedBatches.toSeq
              .apply(rng.nextInt(committedBatches.size))
            graft.operators.BinaryStore.addBatchLabeled(spark, dir,
              b.toDF("vec_id", "qv", "label"), gen = g)
          case 2 if (live -- deleted).nonEmpty =>
            val victims = (live -- deleted).toSeq.sorted
              .filter(_ => rng.nextInt(5) == 0).take(50)
            if (victims.nonEmpty) {
              graft.operators.BinaryStore.delete(spark, dir,
                victims.toDF("vec_id"))
              deleted = deleted ++ victims
            }
          case 3 =>
            graft.operators.BinaryStore.compactLabeled(spark, dir)
            live = live -- deleted
            deleted = Set.empty
          case _ =>
            graft.operators.BinaryStore.vacuum(spark, dir).collect()
        }
        val want = emb.filter(e =>
            live.contains(e._1) && !deleted.contains(e._1))
          .map { case (id, v, l) => id -> ((v, l)) }.toMap
        val wantServe = driverBinaryServeLabeled(want, queries)
        val cur = binStoreServeLabeled(dir, queryDf)
        assert(cur === wantServe, s"step $step op $op: labeled serve drift")
        history += graft.operators.FlatManifest.read(spark, dir).epoch ->
          cur
        val (ep, wantAt) = history(rng.nextInt(history.size))
        assert(binStoreServeLabeled(dir, queryDf,
            epoch = Some(ep)) === wantAt,
          s"step $step: labeled epoch $ep replay drifted")
      }
    }
  }
}
