package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.LogHistogram

/** Properties of the quarter-octave log₂ histogram: bin geometry (every
  * value sits in [lowerBound, next bin)), merge associativity with
  * counts conserved, and the quantile estimate's error contract — the
  * estimate never exceeds the true order statistic and under-estimates
  * it by less than one bin width (×2^¼).
  */
class LogHistogramSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val vGen = Gen.oneOf(
    Gen.choose(1L, 100L),
    Gen.choose(1L, 1_000_000L),
    Gen.choose(1L, Long.MaxValue / 2))

  test("bin geometry: lowerBound(binId(x)) <= x and bins are ordered by value") {
    check(Prop.forAll(vGen, vGen) { (x0, y0) =>
      val (x, y) = (math.min(x0, y0), math.max(x0, y0))
      val (bx, by) = (LogHistogram.binId(x), LogHistogram.binId(y))
      val lbOk = LogHistogram.lowerBound(bx) <= x
      val monotone = bx <= by
      // same bin => same quarter-octave: members within 1.25x
      // (BigInt: 4*y overflows Long for y > 2^61 and would go vacuous)
      val tight = bx != by || BigInt(4) * y < BigInt(5) * x + 5
      Prop(lbOk && monotone && tight) :| s"x=$x y=$y bx=$bx by=$by"
    })
  }

  private val streamGen = Gen.listOf(Gen.choose(1L, 1_000_000L))
    .suchThat(_.nonEmpty)

  test("merge conserves counts and equals single-pass build") {
    check(Prop.forAll(streamGen, streamGen) { (a, b) =>
      val ha = a.foldLeft(Map.empty[Long, Long])(LogHistogram.add)
      val hb = b.foldLeft(Map.empty[Long, Long])(LogHistogram.add)
      val merged = LogHistogram.merge(ha, hb)
      val direct = (a ++ b).foldLeft(Map.empty[Long, Long])(LogHistogram.add)
      merged == direct && merged.values.sum == (a.size + b.size).toLong
    })
  }

  test("quantile estimate brackets the true order statistic") {
    check(Prop.forAll(streamGen, Gen.oneOf(50, 95, 99)) { (xs, q) =>
      val h = xs.foldLeft(Map.empty[Long, Long])(LogHistogram.add)
      val est = LogHistogram.quantile(h, q)
      val sorted = xs.sorted
      // the bin rule picks the bin containing the ceil(n*q/100)-th value
      val idx = math.max(1, (xs.size.toLong * q + 99) / 100).toInt - 1
      val truth = sorted(math.min(idx, xs.size - 1))
      est <= truth && (truth < 4 || truth < est * 2)
    })
  }
}
