package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for window-assignment arithmetic — pure-logic
  * mirrors of the grouping expressions used by Windows/StreamOps (SURVEY §5
  * names property tests on window assignment as our upgrade over the
  * reference's hand-written assertions).
  */
class WindowPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val tsGen = Gen.choose(0L, 10_000_000L)

  private def tumblingStart(t: Long, w: Long): Long = t - Math.floorMod(t, w)

  private def hoppingStarts(t: Long, w: Long, hop: Long): Seq[Long] = {
    val last = t - Math.floorMod(t, hop)
    (0L until w / hop).map(k => last - k * hop).filter(s => t < s + w && t >= s)
  }

  test("tumbling: every event falls in exactly one aligned covering window") {
    check(Prop.forAll(tsGen, Gen.choose(1L, 100_000L)) { (t, w) =>
      val s = tumblingStart(t, w)
      s <= t && t < s + w && Math.floorMod(s, w) == 0L
    })
  }

  test("hopping: event appears in exactly w/hop distinct covering windows") {
    val cfg = for {
      hop <- Gen.choose(1L, 10_000L)
      mult <- Gen.choose(1, 8)
    } yield (hop * mult, hop)
    check(Prop.forAll(tsGen, cfg) { case (t, (w, hop)) =>
      val starts = hoppingStarts(t, w, hop)
      starts.size == (w / hop).toInt &&
        starts.forall(s => s <= t && t < s + w && Math.floorMod(s, hop) == 0L) &&
        starts.distinct.size == starts.size
    })
  }

  test("sessionize: sessions are disjoint, gap-closed, and conserve events") {
    val evGen = Gen.nonEmptyListOf(Gen.choose(0L, 500_000L)).map(_.sorted)
    check(Prop.forAll(evGen, Gen.choose(1L, 60_000L)) { (ts, gap) =>
      // reference semantics: close when next - last >= gap
      val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
        if (t - acc.head.head < gap) (t :: acc.head) :: acc.tail
        else List(t) :: acc
      }.map(_.reverse).reverse
      val conserved = sessions.map(_.size).sum == ts.size
      val intra = sessions.forall(s =>
        s.zip(s.tail).forall { case (a, b) => b - a < gap })
      val inter = sessions.zip(sessions.tail).forall { case (a, b) =>
        b.head - a.last >= gap }
      conserved && intra && inter
    })
  }

  test("generator proportions hold for any whole-block prefix") {
    import graft.sources.Nexmark
    check(Prop.forAll(Gen.choose(50L, 100_000L)) { n =>
      val m = (n / 50) * 50
      val kinds = (0L until m).map(Nexmark.kindOf)
      kinds.count(_ == 0) == m / 50 &&
        kinds.count(_ == 1) == 3 * m / 50 &&
        kinds.count(_ == 2) == 46 * m / 50
    })
  }
}
