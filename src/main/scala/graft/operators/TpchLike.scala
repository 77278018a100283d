package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** TPC-H-shaped queries adapted to the driver's column subset — the
  * reference declares all 8 TPC-H schemas and ships the 22 query texts
  * without an execution path (SURVEY §2.3 note, reference
  * flock/src/datasource/tpch/); we wire the shapes that aren't already
  * covered by Relational: conditional-aggregation pivots (Q12/Q14),
  * top-k revenue join chains (Q10), min-per-group join (Q2), disjunctive
  * multi-column predicates (Q19), and EXISTS-driven counting (Q4).
  */
object TpchLike {

  type Q = (SparkSession, String) => DataFrame

  def defs: Map[String, Q] = Map(
    "q46_case_pivot" -> ((s, d) => q46(s, d)),
    "q47_top_customers" -> ((s, d) => q47(s, d)),
    "q48_min_per_group_join" -> ((s, d) => q48(s, d)),
    "q49_disjunctive_pred" -> ((s, d) => q49(s, d)),
    "q50_exists_agg" -> ((s, d) => q50(s, d))
  )

  /** Q12/Q14 shape: conditional aggregation — priority split per status. */
  private def q46(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "orders")
      .groupBy($"o_orderstatus")
      .agg(
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"),
        round(sum(when($"o_orderpriority" === "1-URGENT", $"o_totalprice")
          .otherwise(lit(0.0))), 2).as("urgent_value"))
      .orderBy($"o_orderstatus")
  }

  /** Q10 shape: top 20 customers by revenue with nation context. */
  private def q47(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val l = Tables(s, d, "lineitem").filter($"l_returnflag" === "R")
    Tables(s, d, "customer")
      .join(Tables(s, d, "orders"), $"c_custkey" === $"o_custkey")
      .join(l, $"o_orderkey" === $"l_orderkey")
      .join(broadcast(Tables(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** Q2 shape: suppliers at the minimum account balance per nation. */
  private def q48(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sup = Tables(s, d, "supplier")
    val minBal = sup.groupBy($"s_nationkey".as("mb_nationkey"))
      .agg(min($"s_acctbal").as("min_bal"))
    sup.join(minBal, $"s_nationkey" === $"mb_nationkey" && $"s_acctbal" === $"min_bal")
      .join(broadcast(Tables(s, d, "nation")), $"s_nationkey" === $"n_nationkey")
      .select($"n_name", $"s_suppkey", $"s_name", $"s_acctbal")
      .orderBy($"n_name", $"s_suppkey")
  }

  /** Q19 shape: disjunction of conjunctive brand/size/quantity clauses —
    * Catalyst pushes the common p_partkey join key through the OR.
    */
  private def q49(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val l = Tables(s, d, "lineitem")
    val p = Tables(s, d, "part")
    l.join(p, $"l_partkey" === $"p_partkey" && (
        ($"p_brand" === "Brand#1" && $"p_size".between(1, 10) && $"l_quantity".between(1, 15)) ||
        ($"p_brand" === "Brand#2" && $"p_size".between(11, 25) && $"l_quantity".between(10, 25)) ||
        ($"p_brand" === "Brand#3" && $"p_size".between(26, 50) && $"l_quantity".between(20, 35))))
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Q4 shape: orders with at least one long-delay lineitem, per priority. */
  private def q50(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val late = Tables(s, d, "lineitem")
      .join(Tables(s, d, "orders").select($"o_orderkey".as("lo_orderkey"), $"o_orderdate"),
        $"l_orderkey" === $"lo_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"))
      .select($"l_orderkey").distinct()
    Tables(s, d, "orders")
      .join(late, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  def oracles: Map[String, String] = Map(
    "q46_case_pivot" ->
      """SELECT o_orderstatus,
         CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count,
         round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END), 2) AS urgent_value
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q47_top_customers" ->
      """SELECT c_custkey, c_name, n_name,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
         GROUP BY 1, 2, 3
         ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "q48_min_per_group_join" ->
      """SELECT n_name, s_suppkey, s_name, s_acctbal
         FROM supplier
         JOIN (SELECT s_nationkey AS mb_nationkey, min(s_acctbal) AS min_bal
               FROM supplier GROUP BY 1) mb
           ON s_nationkey = mb_nationkey AND s_acctbal = min_bal
         JOIN nation ON s_nationkey = n_nationkey
         ORDER BY n_name, s_suppkey""",
    "q49_disjunctive_pred" ->
      """SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         CAST(count(*) AS BIGINT) AS n_lines
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25 AND l_quantity BETWEEN 10 AND 25)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50 AND l_quantity BETWEEN 20 AND 35)""",
    "q50_exists_agg" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
         FROM orders
         WHERE EXISTS (
           SELECT 1 FROM lineitem
           WHERE l_orderkey = o_orderkey
             AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY 1 ORDER BY 1"""
  )
}
