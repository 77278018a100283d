package graft

import org.apache.spark.sql.DataFrame

/** The reference's TPC-H interface is SQL text (it ships the 22 .sql
  * files); this spec runs representative queries as SQL through
  * spark.sql over registered views and checks they equal the DataFrame
  * catalog implementations — the dual-formulation guarantee that a
  * reference user could paste (dialect-adjusted) SQL at this engine.
  */
class TpchSqlSpec extends SparkSpec {

  private def collectSet(df: DataFrame) = df.collect().map(_.toSeq).toSet

  private lazy val ready: Unit = Tables.views(spark, sfDir)

  private def check(name: String, sql: String): Unit = {
    ready
    val viaSql = collectSet(spark.sql(sql))
    val viaDf = collectSet(operators.TpchFull.defs(name)(spark, sfDir))
    assert(viaSql == viaDf, s"$name: sql-only=${(viaSql -- viaDf).take(2)} " +
      s"df-only=${(viaDf -- viaSql).take(2)}")
  }

  test("tpch_q01 SQL text equals DataFrame form") {
    check("tpch_q01",
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
         GROUP BY 1, 2 ORDER BY 1, 2""")
  }

  test("tpch_q05 SQL text equals DataFrame form") {
    check("tpch_q05",
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
         GROUP BY 1 ORDER BY revenue DESC, n_name""")
  }

  test("tpch_q06 SQL text equals DataFrame form") {
    check("tpch_q06",
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""")
  }

  test("tpch_q18 SQL text equals DataFrame form") {
    check("tpch_q18",
      """SELECT c_custkey, c_name, o_orderkey,
         date_format(o_orderdate, 'yyyy-MM-dd') AS o_orderdate, o_totalprice,
         sum_qty
         FROM orders
         JOIN (SELECT l_orderkey AS big_orderkey, sum(l_quantity) AS sum_qty
               FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300) big
           ON o_orderkey = big_orderkey
         JOIN customer ON o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")
  }

  test("tpch_q21 SQL text equals DataFrame form") {
    check("tpch_q21",
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
         GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100""")
  }

  test("tpch_q22 SQL text equals DataFrame form") {
    check("tpch_q22",
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
  }
}
