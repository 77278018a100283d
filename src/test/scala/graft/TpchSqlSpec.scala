package graft

import org.apache.spark.sql.DataFrame

/** The reference's TPC-H interface is SQL text (it ships the 22 .sql
  * files); this spec runs ALL 22 queries as SQL through spark.sql over
  * registered views and checks they equal the DataFrame catalog
  * implementations — the dual-formulation guarantee that a reference
  * user could paste (dialect-adjusted) SQL at this engine.
  */
class TpchSqlSpec extends SparkSpec {

  // multiset (row -> count): a Set would hide duplicate-multiplicity and
  // top-k tie-break divergence between the two formulations
  private def collectBag(df: DataFrame): Map[Seq[Any], Int] =
    df.collect().map(_.toSeq).groupBy(identity).map { case (k, v) => k -> v.length }

  private lazy val ready: Unit = Tables.views(spark, sfDir)

  private def check(name: String, sql: String): Unit = {
    ready
    val viaSql = collectBag(spark.sql(sql))
    val viaDf = collectBag(operators.TpchFull.defs(name)(spark, sfDir))
    val onlySql = viaSql.filter { case (r, n) => viaDf.getOrElse(r, 0) != n }
    val onlyDf = viaDf.filter { case (r, n) => viaSql.getOrElse(r, 0) != n }
    assert(viaSql == viaDf, s"$name: sql-side diff=${onlySql.take(2)} " +
      s"df-side diff=${onlyDf.take(2)}")
  }

  private val texts: Seq[(String, String)] = Seq(
    "tpch_q01" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
         round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_extendedprice), 4) AS avg_price,
         round(avg(l_discount), 4) AS avg_disc,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '2001-09-02'
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "tpch_q02" ->
      """WITH eu_sup AS (
           SELECT s_suppkey, s_name, s_acctbal, n_name
           FROM supplier
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'EUROPE'),
         supplies AS (
           SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS cost
           FROM lineitem GROUP BY 1, 2),
         eu_supplies AS (
           SELECT * FROM supplies JOIN eu_sup ON l_suppkey = s_suppkey),
         min_cost AS (
           SELECT l_partkey AS mc_partkey, min(cost) AS min_cost
           FROM eu_supplies GROUP BY 1)
         SELECT s_acctbal, s_name, n_name, p_partkey, p_name, s_suppkey, cost
         FROM part
         JOIN eu_supplies ON p_partkey = l_partkey
         JOIN min_cost ON p_partkey = mc_partkey AND cost = min_cost
         WHERE p_size BETWEEN 10 AND 15 AND p_type = 'LARGE'
         ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         LIMIT 100""",
    "tpch_q03" ->
      """SELECT l_orderkey,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         date_format(o_orderdate, 'yyyy-MM-dd') AS o_orderdate, o_orderpriority
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-03-15'
           AND l_shipdate > TIMESTAMP '1998-03-15'
         GROUP BY 1, 3, 4
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "tpch_q04" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-07-01'
           AND o_orderdate < TIMESTAMP '1997-10-01'
           AND EXISTS (
             SELECT 1 FROM lineitem
             WHERE l_orderkey = o_orderkey
               AND l_shipdate > o_orderdate + INTERVAL 60 DAYS)
         GROUP BY 1 ORDER BY 1""",
    "tpch_q05" ->
      """SELECT n_name,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY 1 ORDER BY revenue DESC, n_name""",
    "tpch_q06" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "tpch_q07" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation sn ON s_nationkey = sn.n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation cn ON c_nationkey = cn.n_nationkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
             OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "tpch_q08" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         round(sum(CASE WHEN sn.n_name = 'NATION_1'
             THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
           / sum(l_extendedprice * (1.0 - l_discount)), 6) AS mkt_share
         FROM part
         JOIN lineitem ON p_partkey = l_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation sn ON s_nationkey = sn.n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation cn ON c_nationkey = cn.n_nationkey
         JOIN region ON cn.n_regionkey = r_regionkey
         WHERE p_type = 'STANDARD' AND r_name = 'AMERICA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY 1 ORDER BY 1""",
    "tpch_q09" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         sum(CAST(floor((l_extendedprice * (1.0D - l_discount)
           - 0.5D * p_retailprice * l_quantity) * 10000D + 0.5D) AS BIGINT))
           / 10000.0D AS sum_profit
         FROM part
         JOIN lineitem ON p_partkey = l_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         WHERE p_name LIKE '%red%'
         GROUP BY 1, 2 ORDER BY 1, 2 DESC""",
    "tpch_q10" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
         floor(sum(l_extendedprice * (1.0 - l_discount)) * 100 + 0.5001) / 100.0D AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1999-10-01'
           AND o_orderdate < TIMESTAMP '2000-01-01'
         GROUP BY 1, 2, 3, 4
         ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "tpch_q11" ->
      """WITH n3 AS (
           SELECT l_partkey, l_extendedprice * (1.0 - l_discount) AS v
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           WHERE n_name = 'NATION_3')
         SELECT l_partkey, round(sum(v), 2) AS value
         FROM n3 GROUP BY 1
         HAVING sum(v) > 0.002 * (SELECT sum(v) FROM n3)
         ORDER BY value DESC, l_partkey""",
    "tpch_q12" ->
      """SELECT l_returnflag,
         sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1L ELSE 0L END) AS high_line_count,
         sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1L ELSE 0L END) AS low_line_count
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1998-01-01'
           AND l_shipdate < TIMESTAMP '1999-01-01'
           AND l_shipdate > o_orderdate + INTERVAL 90 DAYS
         GROUP BY 1 ORDER BY 1""",
    "tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
         FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer
           LEFT OUTER JOIN orders ON c_custkey = o_custkey
             AND o_orderpriority <> '4-NOT SPECIFIED'
           GROUP BY 1)
         GROUP BY 1 ORDER BY custdist DESC, c_count DESC""",
    "tpch_q14" ->
      """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
             THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
           / sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1998-06-01'
           AND l_shipdate < TIMESTAMP '1998-07-01'""",
    "tpch_q15" ->
      """WITH revenue AS (
           SELECT l_suppkey, sum(l_extendedprice * (1.0 - l_discount)) AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1998-01-01'
             AND l_shipdate < TIMESTAMP '1998-04-01'
           GROUP BY 1)
         SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
         FROM revenue JOIN supplier ON l_suppkey = s_suppkey
         WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
         ORDER BY s_suppkey""",
    "tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
         count(DISTINCT l_suppkey) AS supplier_cnt
         FROM part
         JOIN lineitem ON p_partkey = l_partkey
         WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
           AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25)
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY 1, 2, 3
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "tpch_q17" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
         FROM lineitem
         JOIN part ON p_partkey = l_partkey
         WHERE p_brand = 'Brand#2'
           AND l_quantity < 0.2 * (
             SELECT avg(l2.l_quantity) FROM lineitem l2
             WHERE l2.l_partkey = part.p_partkey)""",
    "tpch_q18" ->
      """SELECT c_custkey, c_name, o_orderkey,
         date_format(o_orderdate, 'yyyy-MM-dd') AS o_orderdate, o_totalprice,
         sum_qty
         FROM orders
         JOIN (SELECT l_orderkey AS big_orderkey, sum(l_quantity) AS sum_qty
               FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300) big
           ON o_orderkey = big_orderkey
         JOIN customer ON o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "tpch_q19" ->
      """SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         count(*) AS n_lines
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#10' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#25' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""",
    "tpch_q20" ->
      """SELECT s_suppkey, s_name
         FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         WHERE n_name = 'NATION_4'
           AND s_suppkey IN (
             SELECT l_suppkey FROM lineitem
             WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
               AND l_shipdate >= TIMESTAMP '1998-01-01'
               AND l_shipdate < TIMESTAMP '1999-01-01'
             GROUP BY 1 HAVING sum(l_quantity) > 50)
         ORDER BY s_suppkey""",
    "tpch_q21" ->
      """WITH li AS (
           SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderstatus = 'F'),
         l1 AS (
           SELECT DISTINCT l_orderkey AS w_orderkey, l_suppkey AS w_suppkey
           FROM li WHERE l_shipdate > o_orderdate + INTERVAL 90 DAYS)
         SELECT s_name, count(*) AS numwait
         FROM l1
         JOIN supplier ON w_suppkey = s_suppkey
         WHERE EXISTS (
             SELECT 1 FROM li x
             WHERE x.l_orderkey = w_orderkey AND x.l_suppkey <> w_suppkey)
           AND NOT EXISTS (
             SELECT 1 FROM l1 y
             WHERE y.w_orderkey = l1.w_orderkey AND y.w_suppkey <> l1.w_suppkey)
         GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100""",
    "tpch_q22" ->
      """WITH cust AS (
           SELECT *, substring(c_name, 17, 2) AS cntrycode FROM customer
           WHERE substring(c_name, 17, 2) IN ('00','11','22','33','44','55','66'))
         SELECT cntrycode, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
         FROM cust
         WHERE c_acctbal > (SELECT avg(c_acctbal) FROM cust WHERE c_acctbal > 0.0)
           AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = cust.c_custkey
                           AND o_orderdate >= TIMESTAMP '2000-01-01')
         GROUP BY 1 ORDER BY 1""")

  texts.foreach { case (name, sql) =>
    test(s"$name SQL text equals DataFrame form") { check(name, sql) }
  }
}
