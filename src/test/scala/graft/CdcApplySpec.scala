package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{CdcEvent, CdcRow}

/** cdcApplyStream: the materialized table (latest emitted state per key)
  * must equal a driver-side replay of the change log in (ts, seq) order —
  * for any micro-batch split of the delivery, including deliveries where
  * stale changes arrive AFTER newer ones in later batches, and deletes
  * must tombstone rather than resurrect.
  */
class CdcApplySpec extends SparkSpec {

  private def ts(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)

  /** Deterministic change log: keys 0..9, 120 changes, ~1/5 deletes. */
  private val changes: Seq[CdcEvent] = {
    val rng = new scala.util.Random(42)
    (0 until 120).map { i =>
      val key = rng.nextInt(10).toLong
      val op = if (rng.nextInt(5) == 0) "delete" else "upsert"
      CdcEvent(key, ts(rng.nextInt(60)), i.toLong, op, s"v$i")
    }
  }

  /** Driver replay: apply all changes in (ts, seq) order, keep latest. */
  private def expectedTable: Map[Long, (Long, Long, String, Boolean)] =
    changes.groupBy(_.key).map { case (k, evs) =>
      val last = evs.maxBy(e => (e.ts.getTime, e.seq))
      (k, (last.ts.getTime, last.seq, last.payload, last.op == "delete"))
    }

  private def runStream(batches: Seq[Seq[CdcEvent]],
      name: String): Map[Long, (Long, Long, String, Boolean)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CdcEvent]
    val q = StreamOps.toMemory(StreamOps.cdcApplyStream(in.toDS()).toDF(),
      name, OutputMode.Update)
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      // the changelog's latest emission per key IS max (ts, seq) — state
      // is monotone in the version order by construction
      spark.table(name).as[CdcRow].collect()
        .groupBy(_.key).map { case (k, rows) =>
          val last = rows.maxBy(r => (r.ts.getTime, r.seq))
          (k, (last.ts.getTime, last.seq, last.payload, last.deleted))
        }
    } finally q.stop()
  }

  test("single-batch apply equals driver replay") {
    assert(runStream(Seq(changes), "cdc_one") == expectedTable)
  }

  test("apply is invariant to micro-batch boundaries") {
    val split = Seq(changes.take(40), changes.slice(40, 80), changes.drop(80))
    assert(runStream(split, "cdc_three") == expectedTable)
  }

  test("stale cross-batch changes are no-ops; deletes tombstone") {
    // deliver NEWEST-first across batches: every later batch is stale
    val byVersion = changes.sortBy(e => (-e.ts.getTime, -e.seq))
    val split = Seq(byVersion.take(30), byVersion.slice(30, 70),
      byVersion.drop(70))
    assert(runStream(split, "cdc_stale") == expectedTable)
    // a delete followed (in version order) by nothing stays a tombstone
    // even when a stale upsert for the key arrives last
    val k = 7L
    val seqd = Seq(
      Seq(CdcEvent(k, ts(100), 1000L, "upsert", "live")),
      Seq(CdcEvent(k, ts(200), 1001L, "delete", "")),
      Seq(CdcEvent(k, ts(150), 1002L, "upsert", "stale")))
    val got = runStream(seqd, "cdc_tomb")
    assert(got(k) == (ts(200).getTime, 1001L, "", true))
  }
}
