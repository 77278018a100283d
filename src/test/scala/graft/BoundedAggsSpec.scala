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
}
