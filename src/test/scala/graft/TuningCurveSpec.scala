package graft

/** q173 ANN operating-point table: the tuning curve's internal
  * consistency (permille arithmetic, fixed level set + the adaptive
  * row), the shortlist/ceiling ordering every row must obey by
  * construction (ADC@5 ≤ refine-25 ≤ refine-100 ≤ routing ceiling —
  * a true neighbor outside every probed cell is unreachable by any
  * ranker), and the monotonicity a deployment relies on — more probes
  * never read less of the store, and on the fixture never lose recall
  * (recall monotonicity is not a theorem — a closer-by-ADC false
  * candidate can displace a true one — so the spec pins that the
  * fixture behaves, and the gate records the numbers). The adaptive
  * row (nprobe 0) must sit inside the fixed envelope: probe mass
  * between the 1- and maxProbes-level masses, ceiling no worse than
  * fixed-1's (the rule always probes at least the best cell).
  */
class TuningCurveSpec extends SparkSpec {

  private case class Row(nprobe: Long, mass: Long, kTotal: Long,
      adcHits: Long, refHits: Long, refWideHits: Long, ceilHits: Long,
      adcPm: Long, refPm: Long, refWidePm: Long, ceilPm: Long)

  test("q173 probe levels are monotone in cost and (on the fixture) recall") {
    import spark.implicits._
    val got = SparkEntry.queries("q173_ann_tuning_curve")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long,
        Long)].collect().toSeq
      .map(r => Row(r._1, r._2, r._3, r._4, r._5, r._6, r._7, r._8,
        r._9, r._10, r._11))
    assert(got.map(_.nprobe) === Seq(0L, 1L, 2L, 4L))
    val byP = got.map(r => r.nprobe -> r).toMap
    val (ad, p1, p2, p4) = (byP(0L), byP(1L), byP(2L), byP(4L))
    // one k_total across levels, and the permille arithmetic holds
    assert(got.map(_.kTotal).distinct.size === 1 && p1.kTotal > 0L)
    got.foreach { r =>
      assert(r.adcPm === r.adcHits * 1000 / r.kTotal)
      assert(r.refPm === r.refHits * 1000 / r.kTotal)
      assert(r.refWidePm === r.refWideHits * 1000 / r.kTotal)
      assert(r.ceilPm === r.ceilHits * 1000 / r.kTotal)
      // the recall ladder every row obeys by construction
      assert(r.adcHits <= r.refHits,
        "refine-25 can only add hits vs its own ADC stage")
      assert(r.refHits <= r.refWideHits,
        "a wider shortlist can only add hits")
      assert(r.refWideHits <= r.ceilHits,
        "no ranker can recall a neighbor whose cell was not probed")
    }
    // more probes read more postings...
    assert(p1.mass <= p2.mass && p2.mass <= p4.mass && p1.mass < p4.mass)
    // ...and on the fixture never lose recall (any stage, incl. ceiling)
    assert(p1.adcHits <= p2.adcHits && p2.adcHits <= p4.adcHits)
    assert(p1.refHits <= p2.refHits && p2.refHits <= p4.refHits)
    assert(p1.refWideHits <= p2.refWideHits &&
      p2.refWideHits <= p4.refWideHits)
    assert(p1.ceilHits <= p2.ceilHits && p2.ceilHits <= p4.ceilHits)
    // the adaptive row sits inside the fixed envelope
    assert(ad.mass >= p1.mass && ad.mass <= p4.mass)
    assert(ad.ceilHits >= p1.ceilHits,
      "adaptive always probes at least the best cell")
  }
}
