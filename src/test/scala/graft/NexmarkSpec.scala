package graft

import org.apache.spark.sql.functions._
import graft.operators.NexmarkQueries
import graft.sources.{Nexmark, Ysb}

/** Value-level checks for the NEXMark workload (no DuckDB oracle exists for
  * generated data): generator invariants + dual-formulation equality
  * (DataFrame vs independent spark.sql text over the same views).
  */
class NexmarkSpec extends SparkSpec {

  private val n = 10000L

  private lazy val views: Unit = {
    Nexmark.persons(spark, n).toDF().createOrReplaceTempView("person")
    Nexmark.auctions(spark, n).toDF().createOrReplaceTempView("auction")
    Nexmark.bids(spark, n).toDF().createOrReplaceTempView("bid")
  }

  test("generator mix is 1:3:46 and ids are dense") {
    val p = Nexmark.persons(spark, n).count()
    val a = Nexmark.auctions(spark, n).count()
    val b = Nexmark.bids(spark, n).count()
    assert(p == n / 50, s"persons $p")
    assert(a == 3 * n / 50, s"auctions $a")
    assert(b == 46 * n / 50, s"bids $b")
    // auction ids are exactly FirstAuctionId until FirstAuctionId + a
    val ids = Nexmark.auctions(spark, n).select("a_id").distinct().count()
    assert(ids == a, "auction ids must be unique per auction event")
  }

  test("generator is deterministic across invocations") {
    val s1 = Nexmark.bids(spark, 2000).collect().toSeq
    val s2 = Nexmark.bids(spark, 2000).collect().toSeq
    assert(s1 == s2)
  }

  test("hot auctions attract a disproportionate share of bids") {
    val counts = Nexmark.bids(spark, n).groupBy("auction").count()
      .orderBy(desc("count")).limit(5).collect().map(_.getLong(1))
    val avg = Nexmark.bids(spark, n).count().toDouble /
      Nexmark.bids(spark, n).select("auction").distinct().count()
    assert(counts.head > 5 * avg, s"hot auction ${counts.head} vs avg $avg")
  }

  test("q1 converts currency and preserves row count") {
    import spark.implicits._
    val b = Nexmark.bids(spark, NexmarkQueries.N)
    val out = NexmarkQueries.q1(spark)
    assert(out.columns.toSeq == Seq("auction", "bidder", "price", "b_date_time"))
    assert(out.count() == b.count())
    val joined = b.select($"auction", $"bidder", $"price".as("orig"), $"b_date_time")
      .join(out, Seq("auction", "bidder", "b_date_time"))
    assert(joined.filter(abs($"price" - lit(0.908) * $"orig") > 1e-9).count() == 0)
  }

  test("q3/q4/q9 dual formulation: DataFrame equals independent SQL") {
    views
    val pairs = Seq(
      NexmarkQueries.q3(spark) ->
        """SELECT name, city, state, a_id
           FROM auction JOIN person ON seller = p_id
           WHERE category = 10 AND state IN ('or','id','ca')""",
      NexmarkQueries.q4(spark) ->
        """SELECT category, avg(final) AS avg_final FROM (
             SELECT a_id, category, max(price) AS final
             FROM auction JOIN bid ON a_id = auction
             WHERE b_date_time BETWEEN a_date_time AND expires
             GROUP BY a_id, category) GROUP BY category""",
      NexmarkQueries.q9(spark) ->
        """SELECT auction, bidder, price, b_date_time
           FROM bid JOIN (
             SELECT a_id AS id, max(price) AS final
             FROM auction JOIN bid ON a_id = auction
             WHERE b_date_time BETWEEN a_date_time AND expires
             GROUP BY a_id) ON auction = id AND price = final""")
    // NexmarkQueries generates N=50000 events; regenerate at that size for
    // SQL views so both sides see identical data.
    Nexmark.persons(spark, NexmarkQueries.N).toDF().createOrReplaceTempView("person")
    Nexmark.auctions(spark, NexmarkQueries.N).toDF().createOrReplaceTempView("auction")
    Nexmark.bids(spark, NexmarkQueries.N).toDF().createOrReplaceTempView("bid")
    pairs.foreach { case (df, sql) =>
      val a = df.collect().toSet
      val b = spark.sql(sql).collect().toSet
      assert(a == b, s"dual formulation mismatch for:\n$sql\nonly-df=${(a -- b).take(3)} only-sql=${(b -- a).take(3)}")
    }
  }

  test("q5/q7 windowed dual formulation: DataFrame equals SQL window()") {
    import spark.implicits._
    Nexmark.bids(spark, NexmarkQueries.N).toDF().createOrReplaceTempView("bid")
    val q5sql = spark.sql(
      """WITH counts AS (
           SELECT window(b_date_time, '10 seconds', '5 seconds') AS w,
                  auction, count(*) AS num
           FROM bid GROUP BY 1, 2),
         maxn AS (SELECT w, max(num) AS maxn FROM counts GROUP BY 1)
         SELECT counts.w.start AS w_start, auction, num
         FROM counts JOIN maxn ON counts.w = maxn.w AND num = maxn""")
      .collect().toSet
    assert(NexmarkQueries.q5(spark).collect().toSet == q5sql)
    val q7sql = spark.sql(
      """WITH b AS (SELECT *, window(b_date_time, '10 seconds') AS w FROM bid),
         mx AS (SELECT w, max(price) AS maxprice FROM b GROUP BY 1)
         SELECT b.w.start AS w_start, auction, price, bidder, b_date_time
         FROM b JOIN mx ON b.w = mx.w AND price = maxprice""")
      .collect().toSet
    assert(NexmarkQueries.q7(spark).collect().toSet == q7sql)
  }

  test("q5 hot items: every window's winners have the window max count") {
    import spark.implicits._
    val out = NexmarkQueries.q5(spark)
    val bad = out.groupBy($"w_start").agg(countDistinct($"num").as("d"))
      .filter($"d" > 1).count()
    assert(bad == 0, "each window must report a single max count")
  }

  test("q11 sessions: bid counts conserve total bids") {
    import spark.implicits._
    val total = NexmarkQueries.q11(spark).agg(sum($"bid_count")).head.getLong(0)
    assert(total == 46 * NexmarkQueries.N / 50, s"session counts $total")
  }

  test("ysb: views only, all ads covered by campaign map") {
    import spark.implicits._
    val out = NexmarkQueries.ysb(spark)
    val totalViews = Ysb.adEvents(spark, NexmarkQueries.N).toDF()
      .filter($"event_type" === "view").count()
    val counted = out.agg(sum($"n_views")).head.getLong(0)
    assert(counted == totalViews, s"$counted != $totalViews")
  }
}
