package graft

import org.apache.spark.sql.functions._
import graft.streaming.EpochRunner

/** Per-epoch runs of element-wise queries must equal whole-batch runs —
  * the equivalence the reference's local tests assume (SURVEY §3.3).
  */
class EpochRunnerSpec extends SparkSpec {

  test("element-wise q1 per-epoch equals whole-batch") {
    import spark.implicits._
    val n = 5000L
    val perEpoch = EpochRunner.elementwiseBids(spark, n, 1000) { df =>
      df.select($"auction", $"bidder", (lit(0.908) * $"price").as("price"), $"b_date_time")
    }.collect().toSet
    val whole = graft.sources.Nexmark.bids(spark, n, 1000).toDF()
      .select($"auction", $"bidder", (lit(0.908) * $"price").as("price"), $"b_date_time")
      .collect().toSet
    assert(perEpoch == whole)
  }

  test("element-wise q2 filter per-epoch equals whole-batch") {
    import spark.implicits._
    val n = 5000L
    val perEpoch = EpochRunner.elementwiseBids(spark, n, 1000) { df =>
      df.filter($"auction" % 123 === 0).select($"auction", $"price")
    }.count()
    val whole = graft.sources.Nexmark.bids(spark, n, 1000).toDF()
      .filter($"auction" % 123 === 0).count()
    assert(perEpoch == whole)
  }
}
