package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MisraGries

/** ScalaCheck properties for the Misra-Gries summary: the sequential
  * guarantees (no overcount, bounded undercount, heavy tokens retained)
  * and — the part that matters for the distributed plan — that MERGING
  * per-split summaries preserves the same guarantees over the combined
  * stream for arbitrary splits and token skews.
  */
class MisraGriesSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  // skewed token streams: small alphabet + zipf-ish repetition
  private val streamGen: Gen[List[String]] = for {
    n <- Gen.choose(0, 400)
    toks <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.const("hot"),
      4 -> Gen.const("warm"),
      2 -> Gen.oneOf("a", "b", "c"),
      1 -> Gen.oneOf((1 to 30).map(i => s"t$i"))))
  } yield toks

  private val kGen = Gen.choose(1, 8)

  private def assertGuarantees(summary: Map[String, Long],
      stream: Seq[String], k: Int): Prop = {
    val exact = stream.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = stream.length.toLong
    val err = n / (k + 1)
    val sizeOk = summary.size <= k
    val noOver = summary.forall { case (t, c) => c <= exact.getOrElse(t, 0L) }
    val bounded = exact.forall { case (t, c) =>
      c - summary.getOrElse(t, 0L) <= err
    }
    val heavyKept = exact.forall { case (t, c) =>
      c <= err || summary.contains(t)
    }
    Prop(sizeOk && noOver && bounded && heavyKept) :| s"summary=$summary"
  }

  test("sequential MG: size, no-overcount, bounded undercount, heavy retained") {
    check(Prop.forAll(streamGen, kGen) { (stream, k) =>
      assertGuarantees(
        MisraGries.updateAll(Map.empty, k, stream), stream, k)
    })
  }

  test("merged MG over an arbitrary split keeps the combined-stream guarantees") {
    check(Prop.forAll(streamGen, streamGen, kGen) { (sa, sb, k) =>
      val merged = MisraGries.merge(
        MisraGries.updateAll(Map.empty, k, sa),
        MisraGries.updateAll(Map.empty, k, sb), k)
      assertGuarantees(merged, sa ++ sb, k)
    })
  }

  test("three-way merge in either association order keeps the guarantees") {
    check(Prop.forAll(streamGen, streamGen, streamGen, kGen) { (sa, sb, sc, k) =>
      val (ma, mb, mc) = (
        MisraGries.updateAll(Map.empty, k, sa),
        MisraGries.updateAll(Map.empty, k, sb),
        MisraGries.updateAll(Map.empty, k, sc))
      val left = MisraGries.merge(MisraGries.merge(ma, mb, k), mc, k)
      val right = MisraGries.merge(ma, MisraGries.merge(mb, mc, k), k)
      assertGuarantees(left, sa ++ sb ++ sc, k) &&
        assertGuarantees(right, sa ++ sb ++ sc, k)
    })
  }
}
