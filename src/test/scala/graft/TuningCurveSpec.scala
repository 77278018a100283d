package graft

/** q173 ANN operating-point table: the tuning curve's internal
  * consistency (permille arithmetic, fixed level set) and the
  * monotonicity a deployment relies on — more probes never read less
  * of the store, and on real data never lose recall (recall
  * monotonicity is not a theorem — a closer-by-ADC false candidate
  * can displace a true one — so the spec pins that the fixture
  * behaves, and the gate records the numbers).
  */
class TuningCurveSpec extends SparkSpec {

  test("q173 probe levels are monotone in cost and (on the fixture) recall") {
    import spark.implicits._
    val got = SparkEntry.queries("q173_ann_tuning_curve")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq(1L, 2L, 4L))
    val Seq(p1, p2, p4) = got
    // one k_total across levels, and the permille arithmetic holds
    assert(got.map(_._3).distinct.size === 1 && p1._3 > 0L)
    got.foreach { r =>
      assert(r._6 === r._4 * 1000 / r._3)
      assert(r._7 === r._5 * 1000 / r._3)
      assert(r._5 >= r._4, "refine can only add hits vs its own ADC stage")
    }
    // more probes read more postings...
    assert(p1._2 <= p2._2 && p2._2 <= p4._2 && p1._2 < p4._2)
    // ...and on the fixture never lose recall
    assert(p1._4 <= p2._4 && p2._4 <= p4._4)
    assert(p1._5 <= p2._5 && p2._5 <= p4._5)
  }
}
