package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Additional SQL shapes beyond the reference's executed corpus, from its
  * unwired TPC-H surface (SURVEY §2.7: tpch/queries dir ships 22 query
  * texts with no runner) plus modern aggregate forms.
  */
object SqlShapes {

  type Q = (SparkSession, String) => DataFrame

  def defs: Map[String, Q] = Map(
    "q42_correlated_subquery" -> ((s, d) => q42(s, d)),
    "q43_rollup" -> ((s, d) => q43(s, d)),
    "q44_cube" -> ((s, d) => q44(s, d)),
    "q45_approx_distinct" -> ((s, d) => q45(s, d)),
    "q51_salted_agg" -> ((s, d) => q51(s, d))
  )

  /** Skew-safe grouped count via graft.plans.Scale salting — value-equal
    * to the plain GROUP BY (which is the DuckDB oracle).
    */
  private def q51(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.plans.Scale.saltedCount(Tables(s, d, "lineitem"), "l_suppkey", 8)
      .select($"l_suppkey", $"cnt")
      .orderBy($"l_suppkey")
  }

  /** TPC-H Q17 shape: correlated scalar subquery — small-quantity orders
    * below 20% of the part's average quantity. Spark decorrelates this to
    * an aggregate + join; we declare it as such directly (the plan
    * Catalyst would produce anyway).
    */
  private def q42(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables(s, d, "lineitem")
    val part = Tables(s, d, "part").filter($"p_brand" === "Brand#1")
      .select($"p_partkey")
    val thr = li.groupBy($"l_partkey".as("t_partkey"))
      .agg((avg($"l_quantity") * 0.2).as("qty_thr"))
    li.join(broadcast(part), $"l_partkey" === $"p_partkey")
      .join(thr, $"l_partkey" === $"t_partkey")
      .filter($"l_quantity" < $"qty_thr")
      .agg(round(sum($"l_extendedprice") / 7.0, 2).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** ROLLUP aggregate with subtotal rows. */
  private def q43(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "orders")
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  /** CUBE aggregate over two dimensions. */
  private def q44(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "customer")
      .cube($"c_mktsegment", $"c_nationkey")
      .agg(count(lit(1)).as("n"))
      .orderBy($"c_mktsegment".asc_nulls_first, $"c_nationkey".asc_nulls_first)
  }

  /** approx_count_distinct (HLL++). Sketches are engine-specific → no
    * DuckDB oracle; the error bound vs exact is asserted in SqlShapesSpec.
    */
  private def q45(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "lineitem")
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"),
        approx_count_distinct($"l_partkey", 0.02).as("approx_parts"))
      .orderBy($"l_returnflag")
  }

  def oracles: Map[String, String] = Map(
    "q42_correlated_subquery" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
         CAST(count(*) AS BIGINT) AS n_lines
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE p_brand = 'Brand#1'
           AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                             FROM lineitem l2
                             WHERE l2.l_partkey = lineitem.l_partkey)""",
    "q43_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
         CAST(count(*) AS BIGINT) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q44_cube" ->
      """SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS n
         FROM customer GROUP BY CUBE (c_mktsegment, c_nationkey)
         ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""",
    "q51_salted_agg" ->
      """SELECT l_suppkey, CAST(count(*) AS BIGINT) AS cnt
         FROM lineitem GROUP BY 1 ORDER BY 1"""
  )
}
