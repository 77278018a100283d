package graft

import org.apache.spark.sql.functions._
import graft.plans.AsOfJoinOp
import java.sql.Timestamp

/** The native as-of operator (custom LogicalPlan + Strategy + SparkPlan)
  * against the composed union+window formulation and hand-computed cases.
  */
class AsOfJoinSpec extends SparkSpec {

  private def ts(sec: Int) = new Timestamp(1_436_918_400_000L + sec * 1000L)

  test("asof join picks the last right row at or before each left time") {
    import spark.implicits._
    val quotes = Seq( // key, qt, px
      (1, ts(0), 100.0), (1, ts(10), 101.0), (1, ts(20), 102.0),
      (2, ts(5), 200.0)).toDF("qkey", "qt", "px")
    val trades = Seq( // key, tt
      (1, ts(9)),   // -> 100.0 (t0)
      (1, ts(10)),  // -> 101.0 (tie: at-or-before includes equal)
      (1, ts(25)),  // -> 102.0
      (2, ts(4)),   // no quote yet -> dropped (inner)
      (2, ts(6)),   // -> 200.0
      (3, ts(1))    // unknown key -> dropped
    ).toDF("tkey", "tt")
    val out = AsOfJoinOp.asofJoin(trades, quotes, "tkey", "qkey", "tt", "qt")
      .select($"tkey", $"tt", $"px").collect()
      .map(r => (r.getInt(0), r.getTimestamp(1), r.getDouble(2))).toSet
    assert(out == Set(
      (1, ts(9), 100.0), (1, ts(10), 101.0), (1, ts(25), 102.0),
      (2, ts(6), 200.0)))
  }

  test("native operator equals the union+window formulation on testdata") {
    import spark.implicits._
    val native = operators.SqlShapes.defs("q62_asof_native")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val composed = operators.SqlShapes.defs("q52_asof_join")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(native == composed)
  }

  test("physical plan is the custom exec with one exchange+sort per side") {
    import spark.implicits._
    val l = Seq((1, ts(1))).toDF("k", "t")
    val r = Seq((1, ts(0), 5.0)).toDF("rk", "rt", "v")
    val df = AsOfJoinOp.asofJoin(l, r, "k", "rk", "t", "rt")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p.take(600))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2, p.take(800))
    assert(df.collect().length == 1)
  }

  test("native operator matches a reference Scala as-of on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0 until 5).foreach { trial =>
      val lefts = Seq.fill(200)((rnd.nextInt(8), ts(rnd.nextInt(60))))
      val rights = Seq.fill(60)((rnd.nextInt(8), ts(rnd.nextInt(60)), rnd.nextDouble()))
        // dedupe (key, time): equal-time right duplicates are documented
        // as last-in-sort-order, which a map-based reference can't model
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val out = AsOfJoinOp.asofJoin(
          lefts.toDF("k", "t"), rights.toDF("rk", "rt", "v"),
          "k", "rk", "t", "rt")
        .select($"k", $"t", $"v").collect()
        .map(r => (r.getInt(0), r.getTimestamp(1), r.getDouble(2)))
        .sortBy(x => (x._1, x._2.getTime, x._3))
      val expected = lefts.flatMap { case (k, t) =>
        rights.filter(r => r._1 == k && !r._2.after(t))
          .sortBy(_._2.getTime).lastOption.map(r => (k, t, r._3))
      }.sortBy(x => (x._1, x._2.getTime, x._3))
      assert(out.toSeq == expected, s"trial $trial")
    }
  }

  test("null keys and null times never match (inner-join null semantics)") {
    import spark.implicits._
    val l = Seq(
      (Some(1), Some(ts(10))),   // normal: matches
      (Some(1), None),           // null time: dropped, NOT treated as epoch 0
      (None, Some(ts(10))),      // null key: dropped (null != null)
      (Some(9), Some(ts(10)))    // key only present as null-time right: dropped
    ).toDF("k", "t")
    val r = Seq(
      (Some(1), Some(ts(0)), 1.0),
      (None, Some(ts(0)), 2.0),   // null right key: never a candidate
      (Some(9), None, 3.0)        // null right time: never a candidate
    ).toDF("rk", "rt", "v")
    val out = AsOfJoinOp.asofJoin(l, r, "k", "rk", "t", "rt")
      .select($"k", $"t", $"v").collect()
      .map(rr => (rr.getInt(0), rr.getTimestamp(1), rr.getDouble(2))).toSet
    assert(out == Set((1, ts(10), 1.0)))
  }

  test("duplicate left timestamps and empty right side behave") {
    import spark.implicits._
    val l = Seq((1, ts(5)), (1, ts(5)), (1, ts(6))).toDF("k", "t")
    val r = Seq((1, ts(5), 1.0)).toDF("rk", "rt", "v")
    val out = AsOfJoinOp.asofJoin(l, r, "k", "rk", "t", "rt").collect()
    assert(out.length == 3) // both t=5 lefts match the t=5 right (<=)
    val empty = Seq.empty[(Int, Timestamp, Double)].toDF("rk", "rt", "v")
    assert(AsOfJoinOp.asofJoin(l, empty, "k", "rk", "t", "rt").collect().isEmpty)
  }

  test("forward as-of equals brute-force first-at-or-after per key") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = operators.SqlShapes.defs("q127_asof_forward")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val ev = Tables(spark, sfDir, "events")
      .select($"event_id", $"user_id", unix_micros($"ts"))
      .as[(Long, Long, Long)].collect()
    val types = Tables(spark, sfDir, "events")
      .select($"event_id", $"event_type").as[(Long, String)].collect().toMap
    val purch = ev.filter(e => types(e._1) == "purchase")
      .groupBy(e => (e._2, e._3))
      .map { case ((u, t), xs) => (u, t, xs.map(_._1).max) }.toSeq
    val expected = ev.filter(_._1 % 13 == 0).flatMap { case (id, u, t) =>
      val cands = purch.filter(p => p._1 == u && p._2 >= t)
      if (cands.isEmpty) None
      else {
        val mt = cands.map(_._2).min
        val b = cands.filter(_._2 == mt).head
        Some((id, u, b._3, (mt - t) / 1000000L))
      }
    }.sortBy(_._1).toSeq
    assert(got == expected)
    // wait times are non-negative by construction
    got.foreach { case (_, _, _, w) => assert(w >= 0) }
  }
}
