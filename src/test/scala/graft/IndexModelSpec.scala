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
}
