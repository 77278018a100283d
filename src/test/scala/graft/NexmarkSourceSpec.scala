package graft

import graft.sources.{Nexmark, NexmarkSource}

/** The DSv2 connector must return exactly the rows the spark.range
  * generator path returns — same ids, same regeneration — while planning
  * real multi-partition parallel reads with zero driver-side data.
  */
class NexmarkSourceSpec extends SparkSpec {

  private def read(entity: String, n: Long) =
    spark.read.format("graft-nexmark")
      .option("entity", entity).option("n", n)
      .option("eps", 1000L).option("partitions", 4).load()

  test("bid source equals the range-generator path row-for-row") {
    import spark.implicits._
    val n = 20000L
    val viaSource = read("bid", n).as[Nexmark.Bid].collect().toSet
    val viaRange = Nexmark.bids(spark, n, 1000L).collect().toSet
    assert(viaSource == viaRange)
    assert(viaSource.nonEmpty)
  }

  test("all three entities respect the 1:3:46 mix and plan 4 partitions") {
    val n = 50000L
    val counts = Seq("person", "auction", "bid").map(e => read(e, n).count())
    val total = counts.sum
    assert(total == n)
    // proportions within integer rounding of 1:3:46 over 50-event epochs
    assert(math.abs(counts(0) - n / 50) <= 1)
    assert(math.abs(counts(1) - 3 * n / 50) <= 3)
    assert(math.abs(counts(2) - 46 * n / 50) <= 46)
    assert(read("bid", n).rdd.getNumPartitions == 4)
  }

  test("limit pushdown caps the generated id space") {
    val limited = read("bid", 1000000L).limit(100)
    val plan = limited.queryExecution.executedPlan.toString
    // the scan's id space must be capped to limit * denominator, far
    // below the requested n=1,000,000
    assert(plan.contains("n=5000,") || plan.contains("n=5000)"),
      s"pushed limit not applied:\n$plan")
    assert(limited.count() == 100)
  }

  test("micro-batch streaming read drains to the same rows as the batch scan") {
    import spark.implicits._
    val n = 10000L
    val q = spark.readStream.format("graft.sources.NexmarkSource")
      .option("entity", "bid").option("n", n)
      .option("eps", 1000L).option("partitions", 4).load()
      .writeStream.format("memory").queryName("nx_dsv2_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("nx_dsv2_stream")
        .as[sources.Nexmark.Bid].collect().toSet
      val batch = read("bid", n).as[sources.Nexmark.Bid].collect().toSet
      assert(streamed == batch)
      // offsets advanced as event ids; at least one batch committed
      assert(q.recentProgress.nonEmpty)
    } finally q.stop()
  }
}
