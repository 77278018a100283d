package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.VectorOps
import graft.streaming.StreamOps

/** Online SemDeDup (the q181 capped quantizer serving a stream):
  * routing reproduces the batch recursion's leaf assignment exactly,
  * verdicts equal a driver greedy replay in event order under ANY
  * batching, duplicates drop against the first-admitted copy, and the
  * watermark horizon re-admits a duplicate arriving after its
  * original aged out.
  */
class SemDedupStreamSpec extends SparkSpec {

  private def dot(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  private def vec(seed: Int): Seq[Long] = {
    val r = new scala.util.Random(seed)
    Seq.fill(64)(r.nextInt(200).toLong)
  }

  // a reference corpus with one over-cap cluster (forces splits) and a
  // far bystander cluster — the SemDedupSpec construction
  private def refCorpus = {
    import spark.implicits._
    val base = vec(1)
    val near = (0 until 60).map { i =>
      (i.toLong, base.zipWithIndex.map { case (x, j) => x + vec(i)(j) % 3 })
    }
    val far = (100 until 106).map(i =>
      (i.toLong, vec(100 + i).map(_ + 1500L)))
    (near ++ far).toDF("vec_id", "qv")
  }

  private def quantizer = {
    import spark.implicits._
    val emb = refCorpus
    val learned = emb.filter($"vec_id".isin(0L, 100L))
      .select(when($"vec_id" === 0L, 0L).otherwise(1L).as("cid"),
        $"qv".as("cq"))
    VectorOps.cappedQuantizer(emb, learned, cap = 8L, maxRounds = 16)
  }

  test("route() reproduces the batch recursion's leaf for every training member") {
    import spark.implicits._
    val (leaves, quant) = quantizer
    assert(quant.splits.nonEmpty, "fixture must actually split")
    val batchCells = leaves.as[(Long, String, Long)].collect()
      .map(l => l._1 -> l._2).toMap
    val vecs = refCorpus.as[(Long, Seq[Long])].collect()
    vecs.foreach { case (id, qv) =>
      assert(quant.route(qv.toArray) === batchCells(id),
        s"member $id routed off the batch leaf")
    }
  }

  test("stream verdicts equal a driver greedy replay under any batching; horizon re-admits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (_, quant) = quantizer
    // the event stream: novel vectors + exact and near duplicates,
    // event times 1 s apart; a final duplicate of event 0 lands after
    // the horizon
    val vecs = refCorpus.as[(Long, Seq[Long])].collect().toMap
    val horizonMs = 20_000L
    // base offset keeps the first event ABOVE the initial watermark
    // (a ts-0 row is dropped as late against watermark 0)
    val t0 = 100_000L
    val events = (
      (0 until 12).map(i => (1000L + i, t0 + i * 1000L, vecs(i.toLong))) ++
        // exact duplicate of the 3rd event, inside the horizon
        Seq((2000L, t0 + 12_000L, vecs(2L))) ++
        // near-duplicate (same direction, scaled) of the 5th event
        Seq((2001L, t0 + 13_000L, vecs(4L).map(_ * 2L))) ++
        // far bystanders
        (0 until 3).map(i => (2100L + i, t0 + (14 + i) * 1000L,
          vecs((100 + i).toLong))) ++
        // exact duplicate of event 0 arriving PAST the horizon: the
        // original aged out, so it must be re-admitted
        Seq((3000L, t0 + 40_000L, vecs(0L)))
      ).map { case (id, ms, qv) =>
        StreamOps.VecEvent(id, new java.sql.Timestamp(ms), qv.toArray)
      }

    // driver greedy replay in (ts, id) order with the same horizon
    def replay(evs: Seq[StreamOps.VecEvent])
        : Seq[(Long, String, Boolean, Long)] = {
      val kept = scala.collection.mutable.Map[String,
        scala.collection.mutable.ArrayBuffer[(Long, Long, Seq[Long], Long)]]()
      evs.sortBy(e => (e.ts.getTime, e.qid)).map { e =>
        val cell = quant.route(e.qv)
        val buf = kept.getOrElseUpdate(cell,
          scala.collection.mutable.ArrayBuffer())
        // age out members past the horizon relative to the newest event
        val newest = math.max(e.ts.getTime,
          if (buf.isEmpty) 0L else buf.map(_._2).max)
        buf.filterInPlace(_._2 >= newest - horizonMs)
        val n2 = dot(e.qv, e.qv)
        val hit = buf.find { case (_, _, kq, kn2) =>
          val d = dot(e.qv, kq)
          d > 0 && d * d * 25L >= n2 * kn2 * 4L
        }
        hit match {
          case Some((kid, _, _, _)) => (e.qid, cell, true, kid)
          case None =>
            buf += ((e.qid, e.ts.getTime, e.qv.toSeq, n2))
            (e.qid, cell, false, -1L)
        }
      }
    }
    val want = replay(events).sortBy(_._1)

    Seq(Seq(events), Seq(events.take(5), events.slice(5, 13),
        events.drop(13))).foreach { batching =>
      val in = MemoryStream[StreamOps.VecEvent]
      val q = StreamOps.toMemory(
        StreamOps.semDedupStream(in.toDS(), quant, "0 seconds",
          horizonMs).toDF(), s"semdedup_t${batching.size}",
        OutputMode.Append)
      try {
        batching.foreach { b => in.addData(b); q.processAllAvailable() }
        val got = spark.table(s"semdedup_t${batching.size}")
          .select($"vec_id", $"cell", $"is_dropped", $"dup_of")
          .as[(Long, String, Boolean, Long)].collect().toSeq
          .sortBy(_._1)
        assert(got === want, s"batching into ${batching.size}")
      } finally q.stop()
    }
    // semantics spot-checks on the replay itself
    val byId = want.map(w => w._1 -> w).toMap
    assert(byId(2000L)._3 && byId(2000L)._4 === 1002L,
      "the exact duplicate must drop against the first-admitted copy")
    assert(byId(2001L)._3,
      "a scaled same-direction vector is a cosine duplicate")
    assert(!byId(3000L)._3,
      "a duplicate past the horizon must be re-admitted")
    assert(want.count(_._3) >= 2 && want.count(!_._3) >= 10)
  }
}
