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
    "q50_exists_agg" -> ((s, d) => q50(s, d)),
    "q54_in_subquery_groupby" -> ((s, d) => q54(s, d)),
    "q55_market_share_ratio" -> ((s, d) => q55(s, d)),
    "q56_exists_and_not_exists" -> ((s, d) => q56(s, d)),
    "q57_avg_subquery_filter" -> ((s, d) => q57(s, d)),
    "q58_having_vs_global" -> ((s, d) => q58(s, d))
  )

  /** Q18 shape: IN over a grouped-HAVING subquery (large-quantity orders). */
  private def q54(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val big = Tables(s, d, "lineitem")
      .groupBy($"l_orderkey").agg(sum($"l_quantity").as("qty"))
      .filter($"qty" > 300)
      .select($"l_orderkey")
    Tables(s, d, "customer")
      .join(Tables(s, d, "orders"), $"c_custkey" === $"o_custkey")
      .join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"c_custkey", $"c_name")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("spend"))
      .orderBy($"c_custkey")
  }

  /** Q8 shape: market share — ratio of conditional revenue sums per year. */
  private def q55(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rev = Tables(s, d, "lineitem")
      .join(Tables(s, d, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(Tables(s, d, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables(s, d, "nation")), $"c_nationkey" === $"n_nationkey")
      .select(year($"o_orderdate").cast("long").as("yr"), $"n_name",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
    rev.groupBy($"yr")
      .agg(round(
        sum(when($"n_name" === "NATION_1", $"rev").otherwise(lit(0.0))) / sum($"rev"),
        6).as("share"))
      .orderBy($"yr")
  }

  /** Q21 shape: EXISTS ∧ NOT EXISTS — urgent-order customers that never
    * placed a very large order.
    */
  private def q56(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val orders = Tables(s, d, "orders")
    val urgent = orders.filter($"o_orderpriority" === "1-URGENT")
    val huge = orders.filter($"o_totalprice" > 400000)
    Tables(s, d, "customer")
      .join(urgent, $"c_custkey" === urgent("o_custkey"), "left_semi")
      .join(huge, $"c_custkey" === huge("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_custkey")
  }

  /** Q22 shape: scalar-average subquery filter + anti join + grouped agg
    * over a name-prefix "country code" analog.
    */
  private def q57(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cust = Tables(s, d, "customer")
    val avgBal = cust.filter($"c_acctbal" > 0)
      .agg(avg($"c_acctbal").as("ab"))
    val recent = Tables(s, d, "orders")
      .filter($"o_orderdate" >= lit("2001-01-01").cast("timestamp"))
    cust.join(broadcast(avgBal))
      .filter($"c_acctbal" > $"ab")
      .join(recent, $"c_custkey" === recent("o_custkey"), "left_anti")
      .groupBy(substring($"c_name", 14, 2).as("prefix"))
      .agg(count(lit(1)).as("n_cust"),
        round(sum($"c_acctbal"), 2).as("total_bal"))
      .orderBy($"prefix")
  }

  /** Q11 shape: grouped HAVING against a global scalar subquery. */
  private def q58(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sup = Tables(s, d, "supplier")
    val global = sup.agg(sum($"s_acctbal").as("total"))
    sup.groupBy($"s_nationkey")
      .agg(round(sum($"s_acctbal"), 2).as("nation_bal"))
      .join(broadcast(global))
      .filter($"nation_bal" > $"total" * 0.05)
      .select($"s_nationkey", $"nation_bal")
      .orderBy($"s_nationkey")
  }

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
    // lineitem stays the PROBE side: the previous customer⋈orders-first
    // order made the planner broadcast the filtered lineitem itself at
    // small SFs (the one shape that cannot survive 100 TB); fact-first,
    // the dims broadcast when small and degrade to shuffle joins at scale
    val l = Tables(s, d, "lineitem").filter($"l_returnflag" === "R")
    l.join(Tables(s, d, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(Tables(s, d, "customer"), $"o_custkey" === $"c_custkey")
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
         GROUP BY 1 ORDER BY 1""",
    "q54_in_subquery_groupby" ->
      """SELECT c_custkey, c_name, CAST(count(*) AS BIGINT) AS n_orders,
         round(sum(o_totalprice), 2) AS spend
         FROM customer JOIN orders ON c_custkey = o_custkey
         WHERE o_orderkey IN (
           SELECT l_orderkey FROM lineitem
           GROUP BY 1 HAVING sum(l_quantity) > 300)
         GROUP BY 1, 2 ORDER BY c_custkey""",
    "q55_market_share_ratio" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         round(sum(CASE WHEN n_name = 'NATION_1'
             THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
           / sum(l_extendedprice * (1.0 - l_discount)), 6) AS share
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1 ORDER BY 1""",
    "q56_exists_and_not_exists" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey
                         AND o_orderpriority = '1-URGENT')
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_totalprice > 400000)
         ORDER BY c_custkey""",
    "q57_avg_subquery_filter" ->
      """SELECT substring(c_name, 14, 2) AS prefix,
         CAST(count(*) AS BIGINT) AS n_cust,
         round(sum(c_acctbal), 2) AS total_bal
         FROM customer
         WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                            WHERE c_acctbal > 0)
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= TIMESTAMP '2001-01-01')
         GROUP BY 1 ORDER BY 1""",
    "q58_having_vs_global" ->
      """SELECT s_nationkey, round(sum(s_acctbal), 2) AS nation_bal
         FROM supplier GROUP BY 1
         HAVING round(sum(s_acctbal), 2) >
           0.05 * (SELECT sum(s_acctbal) FROM supplier)
         ORDER BY 1"""
  )
}
