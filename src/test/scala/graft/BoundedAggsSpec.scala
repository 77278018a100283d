package graft

import org.apache.spark.sql.functions._
import graft.functions.BoundedAggs

/** The bounded-state typed Aggregator: correct under partial merges and
  * groups smaller than k.
  */
class BoundedAggsSpec extends SparkSpec {

  test("kSmallest equals sort-take under many partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(5000)((rnd.nextInt(7), rnd.nextInt(100000).toLong)) ++
      Seq((9, 42L)) // a group smaller than k
    val df = rows.toDF("g", "v").repartition(16) // force partial merges
    val got = df.groupBy($"g").agg(BoundedAggs.kSmallest($"v", 5).as("s"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val want = rows.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2).sorted.take(5).mkString(",")
    }
    assert(got == want)
    assert(got(9) == "42")
  }

  test("duplicate values are kept with multiplicity") {
    import spark.implicits._
    val df = Seq((1, 3L), (1, 3L), (1, 1L), (1, 9L), (1, 9L), (1, 9L), (1, 2L))
      .toDF("g", "v").repartition(4)
    val got = df.groupBy($"g").agg(BoundedAggs.kSmallest($"v", 5).as("s"))
      .head().getString(1)
    assert(got == "1,2,3,3,9")
  }

  test("topScored equals sort-take under many partitions and keep filter") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // deliberately few distinct scores so ties exercise the id tiebreak
    val rows = (0 until 4000).map { i =>
      (rnd.nextInt(6), rnd.nextInt(12) / 10.0, i.toLong, rnd.nextBoolean())
    } :+ ((9, 0.5, 99L, true)) :+ ((8, 0.1, 7L, false)) // small / all-filtered
    val df = rows.toDF("g", "score", "id", "keep").repartition(16)
    val got = df.groupBy($"g")
      .agg(BoundedAggs.topScored($"score", $"id", $"keep", 3).as("t"))
      .as[(Int, Seq[(Double, Long)])].collect().toMap
    val want = rows.groupBy(_._1).map { case (g, xs) =>
      g -> xs.filter(_._4).map(x => (x._2, x._3))
        .sortBy { case (s, i) => (-s, i) }.take(3)
    }
    assert(got.keySet == want.keySet)
    for (g <- want.keys) assert(got(g) == want(g), s"group $g")
    assert(got(8).isEmpty)
    assert(got(9) == Seq((0.5, 99L)))
  }

  test("topScored drops NaN scores (zero-norm cosines never 'win')") {
    import spark.implicits._
    // NaN answers false to every comparison Scala-side while Spark's
    // orderBy(desc) would sort it LARGEST — the aggregator defines NaN
    // away (documented divergence from the window form): a NaN-scored
    // row must neither appear nor evict a real row.
    val rows = Seq(
      (0, Double.NaN, 1L, true), (0, 0.9, 2L, true), (0, 0.7, 3L, true),
      (0, Double.NaN, 4L, true), (0, 0.8, 5L, true), (0, 0.6, 6L, true),
      (1, Double.NaN, 7L, true)) // group with ONLY NaN scores
    for (parts <- Seq(1, 4)) {
      val got = rows.toDF("g", "score", "id", "keep").repartition(parts)
        .groupBy($"g")
        .agg(BoundedAggs.topScored($"score", $"id", $"keep", 3).as("t"))
        .as[(Int, Seq[(Double, Long)])].collect().toMap
      assert(got(0) == Seq((0.9, 2L), (0.8, 5L), (0.7, 3L)), s"parts=$parts")
      assert(got(1).isEmpty, s"parts=$parts")
    }
  }

  test("topScored merge is order-insensitive (random partitionings agree)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 1000).map(i => (0, rnd.nextInt(5) / 10.0, i.toLong, true))
    val expected = rows.map(x => (x._2, x._3))
      .sortBy { case (s, i) => (-s, i) }.take(3)
    for (parts <- Seq(1, 3, 17, 64)) {
      val got = rows.toDF("g", "score", "id", "keep").repartition(parts)
        .groupBy($"g")
        .agg(BoundedAggs.topScored($"score", $"id", $"keep", 3).as("t"))
        .as[(Int, Seq[(Double, Long)])].head()._2
      assert(got == expected, s"parts=$parts")
    }
  }
}
