package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational operator inventory (SURVEY §2.2–§2.7), re-expressed
  * Spark-first over the driver testdata tables.
  *
  * Shapes covered and their reference analogs:
  *  - projection + scalar arithmetic   (NEXMark q1, q1.sql:1-5)
  *  - filter + MOD                     (NEXMark q2, q2.sql:1-4)
  *  - partitioned hash equi-join       (NEXMark q3, stage.rs:850-864)
  *  - equi-join + range residual       (NEXMark q4/q6/q9, q4.sql:5-9)
  *  - join on aggregate result         (NEXMark q5/q7, q5.sql:1-12)
  *  - ROW_NUMBER rank + filter         (NEXMark q6, q6.sql:1-26)
  *  - global agg / count distinct      (q7.sql:5-6, stage.rs:528-543)
  *  - sort + limit (top-k)             (stage.rs:643-659)
  *  - broadcast side-input join        (NEXMark q13, actor.rs:575-629)
  *  - two-phase hash aggregation       (stage.rs:571-583 — Spark does this
  *                                      natively as Partial/Final HashAggregate)
  *  - semi/anti/outer joins, set ops   (Spark built-ins; absent from the
  *                                      executed reference corpus but part of
  *                                      its TPC-H surface, tpch/queries dir)
  *
  * Conventions (driver correctness gate):
  *  - every output column is aliased identically in Spark and oracle SQL;
  *  - results are deterministically ordered (unique sort key);
  *  - row-level float arithmetic is left unrounded (bit-identical across
  *    engines); aggregated floats are rounded (accumulation order differs);
  *  - timestamps in output are formatted to strings (avoids tz/precision
  *    representation drift between Spark parquet and DuckDB);
  *  - counts are BIGINT on both sides.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  def defs: Map[String, Q] = Map(
    "q01_pricing_summary" -> ((s, d) => q01(s, d)),
    "q02_filter_mod" -> ((s, d) => q02(s, d)),
    "q03_join_topk" -> ((s, d) => q03(s, d)),
    "q04_range_join_agg" -> ((s, d) => q04(s, d)),
    "q05_join_on_agg" -> ((s, d) => q05(s, d)),
    "q06_rank_per_key" -> ((s, d) => q06(s, d)),
    "q07_global_max_join" -> ((s, d) => q07(s, d)),
    "q08_semi_join" -> ((s, d) => q08(s, d)),
    "q09_anti_join" -> ((s, d) => q09(s, d)),
    "q10_outer_join_agg" -> ((s, d) => q10(s, d)),
    "q11_count_distinct" -> ((s, d) => q11(s, d)),
    "q12_sort_limit" -> ((s, d) => q12(s, d)),
    "q13_broadcast_side_join" -> ((s, d) => q13(s, d)),
    "q14_union_distinct" -> ((s, d) => q14(s, d)),
    "q15_intersect" -> ((s, d) => q15(s, d)),
    "q16_except" -> ((s, d) => q16(s, d)),
    "q17_multi_join_revenue" -> ((s, d) => q17(s, d)),
    "q18_window_analytics" -> ((s, d) => q18(s, d)),
    "q19_scalar_exprs" -> ((s, d) => q19(s, d)),
    "q20_global_agg" -> ((s, d) => q20(s, d)),
    "q21_having" -> ((s, d) => q21(s, d))
  )

  /** TPC-H Q1-shaped pricing summary: filter → two-phase hash agg. */
  private def q01(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "lineitem")
      .filter($"l_shipdate" <= lit("1999-12-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** NEXMark q2 analog: filter with MOD; projection pruned to 4 cols. */
  private def q02(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "lineitem")
      .filter($"l_orderkey" % 123 === 0)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** NEXMark q3 analog: filtered dim ⋈ fact, top-k by price. */
  private def q03(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables(s, d, "customer").filter($"c_mktsegment" === "BUILDING")
    val o = Tables(s, d, "orders")
    c.join(o, $"c_custkey" === $"o_custkey")
      .select($"o_orderkey", $"c_name", $"o_totalprice",
        date_format($"o_orderdate", "yyyy-MM-dd").as("o_date"))
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  /** NEXMark q4 analog: equi-join + BETWEEN range residual, then agg. */
  private def q04(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables(s, d, "orders")
    val l = Tables(s, d, "lineitem")
    o.join(l, $"o_orderkey" === $"l_orderkey" &&
        $"l_shipdate".between($"o_orderdate", $"o_orderdate" + expr("INTERVAL 90 DAYS")))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("line_count"),
        round(avg($"l_extendedprice"), 4).as("avg_price"))
      .orderBy($"o_orderpriority")
  }

  /** NEXMark q5 analog: hot items — join grouped counts against their max. */
  private def q05(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cnt = Tables(s, d, "lineitem")
      .groupBy($"l_partkey").agg(count(lit(1)).as("cnt"))
    val mx = cnt.agg(max($"cnt").as("maxcnt"))
    cnt.join(broadcast(mx), $"cnt" === $"maxcnt")
      .select($"l_partkey", $"cnt")
      .orderBy($"l_partkey")
  }

  /** NEXMark q6 analog: ROW_NUMBER per key, keep rank 1 (winning bid). */
  private def q06(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_partkey")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
    Tables(s, d, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"l_partkey", $"l_orderkey", $"l_extendedprice")
      .orderBy($"l_partkey")
  }

  /** NEXMark q7 analog: rows matching the global max (scalar-agg join). */
  private def q07(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val l = Tables(s, d, "lineitem")
    val mx = l.agg(max($"l_extendedprice").as("mx"))
    l.join(broadcast(mx), $"l_extendedprice" === $"mx")
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** Left-semi join (EXISTS): customers that have orders. */
  private def q08(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "customer")
      .join(Tables(s, d, "orders"), $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Left-anti join (NOT EXISTS): customers with no large orders. */
  private def q09(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bigOrders = Tables(s, d, "orders").filter($"o_totalprice" > 300000)
    Tables(s, d, "customer")
      .join(bigOrders, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Left-outer join + agg preserving empty groups. */
  private def q10(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "nation")
      .join(Tables(s, d, "customer"), $"n_nationkey" === $"c_nationkey", "left")
      .groupBy($"n_name")
      .agg(count($"c_custkey").as("n_cust"),
        round(coalesce(sum($"c_acctbal"), lit(0.0)), 2).as("tot_bal"))
      .orderBy($"n_name")
  }

  /** COUNT(DISTINCT) — reference expands to two-level agg (stage.rs:528). */
  private def q11(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "lineitem")
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  /** Global sort + limit → Spark TakeOrderedAndProject (top-k, no full sort). */
  private def q12(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(50)
  }

  /** NEXMark q13 analog: fact ⋈ small side input — explicit broadcast. */
  private def q13(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val side = Tables(s, d, "part")
      .filter($"p_size" <= 5)
      .select($"p_partkey", $"p_brand")
    Tables(s, d, "lineitem")
      .join(broadcast(side), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_lines"),
        round(sum($"l_quantity"), 2).as("sum_qty"))
      .orderBy($"p_brand")
  }

  /** UNION DISTINCT of two key sets. */
  private def q14(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val a = Tables(s, d, "customer").filter($"c_acctbal" > 9000)
      .select($"c_custkey".as("key"))
    val b = Tables(s, d, "orders").filter($"o_totalprice" > 400000)
      .select($"o_custkey".as("key"))
    a.union(b).distinct().orderBy($"key")
  }

  /** INTERSECT of two key sets. */
  private def q15(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val a = Tables(s, d, "customer").filter($"c_acctbal" > 5000)
      .select($"c_custkey".as("key"))
    val b = Tables(s, d, "orders").filter($"o_totalprice" > 300000)
      .select($"o_custkey".as("key"))
    a.intersect(b).orderBy($"key")
  }

  /** EXCEPT of two key sets. */
  private def q16(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val a = Tables(s, d, "customer").filter($"c_acctbal" > 5000)
      .select($"c_custkey".as("key"))
    val b = Tables(s, d, "orders").filter($"o_totalprice" > 300000)
      .select($"o_custkey".as("key"))
    a.except(b).orderBy($"key")
  }

  /** TPC-H Q5-shaped star join: region ⋈ nation broadcast, fact chain joins.
    * At 100 TB the region/nation dims stay tiny → broadcast; customer/orders/
    * lineitem co-shuffle on their keys (Catalyst plans SMJ/SHJ + AQE).
    */
  private def q17(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val r = Tables(s, d, "region").filter($"r_name" =!= "ZZZ")
    val n = Tables(s, d, "nation")
    val c = Tables(s, d, "customer")
    val o = Tables(s, d, "orders")
    val l = Tables(s, d, "lineitem")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy($"r_name", $"n_name")
  }

  /** Analytic window suite: lag + running sum + rank over a frame. */
  private def q18(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables(s, d, "orders")
      .filter($"o_custkey" % 10 === 0)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        coalesce(lag($"o_totalprice", 1).over(w), lit(0.0)).as("prev_price"),
        round(sum($"o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2)
          .as("running_spend"),
        row_number().over(w).cast("long").as("order_seq"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Scalar expression suite: string fns, CASE, date parts, floor-cast. */
  private def q19(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "orders")
      .filter($"o_orderkey" % 57 === 0)
      .select($"o_orderkey",
        upper(substring($"o_orderpriority", 1, 3)).as("pri3"),
        concat($"o_orderstatus", lit("-"), $"o_orderpriority").as("tag"),
        year($"o_orderdate").cast("long").as("yr"),
        month($"o_orderdate").cast("long").as("mo"),
        when($"o_totalprice" > 250000, "big").otherwise("small").as("bucket"),
        floor($"o_totalprice").as("price_floor"))
      .orderBy($"o_orderkey")
  }

  /** Global (no group-by) aggregate — single row. */
  private def q20(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "lineitem")
      .agg(round(min($"l_quantity"), 2).as("min_qty"),
        round(max($"l_quantity"), 2).as("max_qty"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("n"))
  }

  /** GROUP BY + HAVING. */
  private def q21(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "orders")
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("spend"))
      .filter($"n_orders" >= 15)
      .orderBy($"o_custkey")
  }

  def oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base_price,
         round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
         round(avg(l_quantity),4) AS avg_qty,
         round(avg(l_discount),4) AS avg_disc,
         CAST(count(*) AS BIGINT) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-01'
         GROUP BY 1,2 ORDER BY 1,2""",
    "q02_filter_mod" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
         FROM lineitem WHERE l_orderkey % 123 = 0
         ORDER BY l_orderkey, l_linenumber""",
    "q03_join_topk" ->
      """SELECT o_orderkey, c_name, o_totalprice,
         strftime(o_orderdate, '%Y-%m-%d') AS o_date
         FROM customer JOIN orders ON c_custkey = o_custkey
         WHERE c_mktsegment = 'BUILDING'
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "q04_range_join_agg" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS line_count,
         round(avg(l_extendedprice),4) AS avg_price
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 90 DAY
         GROUP BY 1 ORDER BY 1""",
    "q05_join_on_agg" ->
      """SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
         FROM lineitem GROUP BY 1
         HAVING count(*) = (SELECT max(c) FROM
           (SELECT count(*) AS c FROM lineitem GROUP BY l_partkey))
         ORDER BY l_partkey""",
    "q06_rank_per_key" ->
      """SELECT l_partkey, l_orderkey, l_extendedprice FROM (
           SELECT l_partkey, l_orderkey, l_extendedprice,
           row_number() OVER (PARTITION BY l_partkey
             ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
           FROM lineitem) t WHERE rn = 1 ORDER BY l_partkey""",
    "q07_global_max_join" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         WHERE l_extendedprice = (SELECT max(l_extendedprice) FROM lineitem)
         ORDER BY l_orderkey, l_linenumber""",
    "q08_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q09_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 300000)
         ORDER BY c_custkey""",
    "q10_outer_join_agg" ->
      """SELECT n_name, CAST(count(c_custkey) AS BIGINT) AS n_cust,
         round(coalesce(sum(c_acctbal), 0.0),2) AS tot_bal
         FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
         GROUP BY 1 ORDER BY 1""",
    "q11_count_distinct" ->
      """SELECT l_returnflag,
         CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
         CAST(count(*) AS BIGINT) AS n_rows
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q12_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""",
    "q13_broadcast_side_join" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
         round(sum(l_quantity),2) AS sum_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size <= 5 GROUP BY 1 ORDER BY 1""",
    "q14_union_distinct" ->
      """SELECT DISTINCT key FROM (
           SELECT c_custkey AS key FROM customer WHERE c_acctbal > 9000
           UNION ALL
           SELECT o_custkey AS key FROM orders WHERE o_totalprice > 400000) t
         ORDER BY key""",
    "q15_intersect" ->
      """SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000
         INTERSECT
         SELECT o_custkey AS key FROM orders WHERE o_totalprice > 300000
         ORDER BY key""",
    "q16_except" ->
      """SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000
         EXCEPT
         SELECT o_custkey AS key FROM orders WHERE o_totalprice > 300000
         ORDER BY key""",
    "q17_multi_join_revenue" ->
      """SELECT r_name, n_name,
         round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue,
         CAST(count(*) AS BIGINT) AS n_lines
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name <> 'ZZZ'
         GROUP BY 1,2 ORDER BY 1,2""",
    "q18_window_analytics" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
         coalesce(lag(o_totalprice, 1) OVER w, 0.0) AS prev_price,
         round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW),2) AS running_spend,
         CAST(row_number() OVER w AS BIGINT) AS order_seq
         FROM orders WHERE o_custkey % 10 = 0
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "q19_scalar_exprs" ->
      """SELECT o_orderkey,
         upper(substring(o_orderpriority, 1, 3)) AS pri3,
         o_orderstatus || '-' || o_orderpriority AS tag,
         CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(month(o_orderdate) AS BIGINT) AS mo,
         CASE WHEN o_totalprice > 250000 THEN 'big' ELSE 'small' END AS bucket,
         CAST(floor(o_totalprice) AS BIGINT) AS price_floor
         FROM orders WHERE o_orderkey % 57 = 0 ORDER BY o_orderkey""",
    "q20_global_agg" ->
      """SELECT round(min(l_quantity),2) AS min_qty,
         round(max(l_quantity),2) AS max_qty,
         round(avg(l_quantity),4) AS avg_qty,
         CAST(count(*) AS BIGINT) AS n
         FROM lineitem""",
    "q21_having" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
         round(sum(o_totalprice),2) AS spend
         FROM orders GROUP BY 1 HAVING count(*) >= 15 ORDER BY o_custkey"""
  )
}
