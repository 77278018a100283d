package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamOps

/** driftMonitorStream: each micro-batch's (n, TVD, mean distortion) row
  * equals a driver brute force using q174's integer arithmetic — for an
  * in-distribution batch (low TVD) and a drifted batch concentrated in
  * one cell (high TVD, high distortion), under the same centroids and
  * reference counts.
  */
class DriftStreamSpec extends SparkSpec {

  private def d2(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("per-batch drift rows equal the driver arithmetic, and drift is visible") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 4 well-separated reference cells on a plane, dims 0..3
    def axis(i: Int, mag: Long) =
      Array.tabulate(8)(j => if (j == i) mag else 0L)
    val cents = (0 until 4).map(c => (c.toLong, axis(c, 1000L).toSeq))
      .toDF("cid", "cq")
    // reference occupancy: balanced 25/25/25/25
    val refCounts = (0 until 4).map(c => (c.toLong, 25L))
      .toDF("cid", "n_c")
    val refTotal = 100L
    val refDist = Map(0L -> 25L, 1L -> 25L, 2L -> 25L, 3L -> 25L)

    // batch 1: in-distribution (3 vectors per cell, near centroids);
    // batch 2: drifted — all mass near cell 0, far out on its axis
    val b1 = (0 until 12).map { i =>
      StreamOps.IndexVec(100L + i, axis(i % 4, 990L + i))
    }
    val b2 = (0 until 8).map { i =>
      StreamOps.IndexVec(200L + i, axis(0, 1400L + 10L * i))
    }

    val centRows = cents.as[(Long, Seq[Long])].collect()
    def wantRow(batch: Seq[StreamOps.IndexVec]): (Long, Long, Long) = {
      val assigned = batch.map { v =>
        centRows.minBy { case (c, cq) => (d2(v.qv.toSeq, cq), c) } match {
          case (c, cq) => (c, d2(v.qv.toSeq, cq))
        }
      }
      val nB = assigned.size.toLong
      val bc = assigned.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val num = (0L until 4L).map(c =>
        math.abs(bc.getOrElse(c, 0L) * refTotal - refDist(c) * nB)).sum
      (nB, 500L * num / (nB * refTotal), assigned.map(_._2).sum / nB)
    }

    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(Long, (Long, Long, Long))]
    val in = MemoryStream[StreamOps.IndexVec]
    val q = StreamOps.driftMonitorStream(in.toDS(), cents, refCounts) {
      (df, batchId) =>
        val r = df.as[(Long, Long, Long)].collect()
        assert(r.length === 1)
        emitted += batchId -> r.head
    }
    try {
      in.addData(b1)
      q.processAllAvailable()
      in.addData(b2)
      q.processAllAvailable()
    } finally q.stop()

    val rows = emitted.sortBy(_._1).map(_._2)
    assert(rows === Seq(wantRow(b1), wantRow(b2)))
    val (inDist, drifted) = (rows(0), rows(1))
    assert(inDist._2 < drifted._2, "drifted batch must score higher TVD")
    assert(drifted._2 >= 700L, "all-one-cell batch vs balanced ref is extreme")
    assert(inDist._3 < drifted._3, "out-of-manifold batch raises distortion")
  }
}
