package graft

import graft.operators.Relational

/** Smoke + invariant tests for the relational catalog at sf0.001.
  * Full value-level verification is the driver's DuckDB gate; here we
  * assert structural invariants cheaply so `sbt test` stays fast.
  */
class RelationalSpec extends SparkSpec {

  test("every relational query runs and yields a stable schema") {
    Relational.defs.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val rows = df.count()
      assert(rows >= 0, s"$name failed to execute")
      assert(df.columns.nonEmpty, s"$name has empty schema")
      assert(df.columns.distinct.length == df.columns.length,
        s"$name has duplicate column names")
    }
  }

  test("every query has an oracle or is explicitly rows-only") {
    val missing = Relational.defs.keySet -- Relational.oracles.keySet
    assert(missing.isEmpty, s"relational queries missing oracles: $missing")
  }

  test("q01 aggregates are conserved") {
    import org.apache.spark.sql.functions._
    val li = Tables(spark, sfDir, "lineitem")
    val total = li.filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp")).count()
    val agg = Relational.defs("q01_pricing_summary")(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("count_order")).head.getLong(0)
    assert(agg == total, "q01 group counts must sum to table size")
  }

  test("q08 semi + q09 anti partition the customer set") {
    import org.apache.spark.sql.functions._
    val c = Tables(spark, sfDir, "customer")
    val bigOrders = Tables(spark, sfDir, "orders").filter(col("o_totalprice") > 300000)
    val semi = c.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = Relational.defs("q09_anti_join")(spark, sfDir).count()
    assert(semi + anti == c.count())
  }

  test("q12 top-k is ordered descending") {
    val prices = Relational.defs("q12_sort_limit")(spark, sfDir)
      .collect().map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }
}
