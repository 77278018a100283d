package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.{Nexmark, Ysb}

/** The reference's executed workload — NEXMark q0–q13 + YSB — re-expressed
  * as Spark DataFrame transforms over the deterministic generator.
  * Query texts: /root/reference/benchmarks/src/nexmark/query/q{0..13}.sql,
  * /root/reference/benchmarks/src/ysb/ysb.sql. Window types per query:
  * /root/reference/benchmarks/src/nexmark/main.rs:116-123 (q5 hopping 10/5,
  * q7/q8 tumbling 10s, q11 session 10s, q12 proc-time 10s, rest
  * element-wise).
  *
  * These run on generated events (no driver-table oracle → rows-only in the
  * correctness gate); value-level checks are dual-formulation SQL-vs-
  * DataFrame equality + invariants in NexmarkSpec.
  */
object NexmarkQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Events per catalog run: 50 s at 1000 events/s. */
  val N: Long = 50000
  val Eps: Long = 1000

  def defs: Map[String, Q] = Map(
    "nx_q00_passthrough" -> ((s, _) => q0(s)),
    "nx_q01_currency" -> ((s, _) => q1(s)),
    "nx_q02_filter" -> ((s, _) => q2(s)),
    "nx_q03_local_sellers" -> ((s, _) => q3(s)),
    "nx_q04_avg_final_price" -> ((s, _) => q4(s)),
    "nx_q05_hot_items" -> ((s, _) => q5(s)),
    "nx_q06_avg_seller_price" -> ((s, _) => q6(s)),
    "nx_q07_highest_bid" -> ((s, _) => q7(s)),
    "nx_q08_new_sellers" -> ((s, _) => q8(s)),
    "nx_q09_winning_bids" -> ((s, _) => q9(s)),
    "nx_q10_bid_log" -> ((s, _) => q10(s)),
    "nx_q11_bid_sessions" -> ((s, _) => q11(s)),
    "nx_q12_proctime_bids" -> ((s, _) => q12(s)),
    "nx_q13_side_input_join" -> ((s, _) => q13(s)),
    "nx_ysb_campaigns" -> ((s, _) => ysb(s))
  )

  private def bids(s: SparkSession): DataFrame = Nexmark.bids(s, N, Eps).toDF()
  private def auctions(s: SparkSession): DataFrame = Nexmark.auctions(s, N, Eps).toDF()
  private def persons(s: SparkSession): DataFrame = Nexmark.persons(s, N, Eps).toDF()

  /** q0: passthrough. */
  def q0(s: SparkSession): DataFrame = bids(s)

  /** q1: currency conversion 0.908 × price. */
  def q1(s: SparkSession): DataFrame = {
    import s.implicits._
    bids(s).select($"auction", $"bidder",
      (lit(0.908) * $"price").as("price"), $"b_date_time")
  }

  /** q2: selection auction % 123 = 0. */
  def q2(s: SparkSession): DataFrame = {
    import s.implicits._
    bids(s).filter($"auction" % 123 === 0).select($"auction", $"price")
  }

  /** q3: local item — OR/ID/CA sellers of category-10 auctions. */
  def q3(s: SparkSession): DataFrame = {
    import s.implicits._
    auctions(s).filter($"category" === 10)
      .join(persons(s).filter($"state".isin("or", "id", "ca")),
        $"seller" === $"p_id")
      .select($"name", $"city", $"state", $"a_id")
  }

  /** q4: average closing price per category. */
  def q4(s: SparkSession): DataFrame = {
    import s.implicits._
    val winning = auctions(s)
      .join(bids(s), $"a_id" === $"auction" &&
        $"b_date_time".between($"a_date_time", $"expires"))
      .groupBy($"a_id", $"category")
      .agg(max($"price").as("final"))
    winning.groupBy($"category").agg(avg($"final").as("avg_final"))
  }

  /** q5: hot items per hopping window (10 s / 5 s): auctions with the
    * max bid count in each window.
    */
  def q5(s: SparkSession): DataFrame = {
    import s.implicits._
    val counts = bids(s)
      .groupBy(window($"b_date_time", "10 seconds", "5 seconds").as("w"), $"auction")
      .agg(count(lit(1)).as("num"))
    val maxn = counts.groupBy($"w").agg(max($"num").as("maxn"))
    counts.join(maxn, Seq("w")).filter($"num" === $"maxn")
      .select($"w.start".as("w_start"), $"auction", $"num")
  }

  /** q6: average price of the last 10 winning bids per seller. */
  def q6(s: SparkSession): DataFrame = {
    import s.implicits._
    val wPrice = Window.partitionBy($"a_id")
      .orderBy($"price".desc, $"b_date_time")
    val wTime = Window.partitionBy($"seller").orderBy($"b_date_time".desc)
    val winning = auctions(s)
      .join(bids(s), $"a_id" === $"auction" &&
        $"b_date_time".between($"a_date_time", $"expires"))
      .withColumn("price_rank", row_number().over(wPrice))
      .filter($"price_rank" === 1)
    winning.withColumn("time_rank", row_number().over(wTime))
      .filter($"time_rank" <= 10)
      .groupBy($"seller").agg(avg($"price").as("avg_price"))
  }

  /** q7: highest bid per tumbling 10 s window. */
  def q7(s: SparkSession): DataFrame = {
    import s.implicits._
    val b = bids(s).withColumn("w", window($"b_date_time", "10 seconds"))
    val mx = b.groupBy($"w").agg(max($"price").as("maxprice"))
    b.join(mx, Seq("w")).filter($"price" === $"maxprice")
      .select($"w.start".as("w_start"), $"auction", $"price", $"bidder", $"b_date_time")
  }

  /** q8: monitor new users — persons who created auctions in the same
    * tumbling 10 s window they registered in.
    */
  def q8(s: SparkSession): DataFrame = {
    import s.implicits._
    val p = persons(s)
      .withColumn("w", window($"p_date_time", "10 seconds"))
      .select($"p_id", $"name", $"w")
    val a = auctions(s)
      .withColumn("wa", window($"a_date_time", "10 seconds"))
      .select($"seller", $"wa")
    p.join(a, p("p_id") === a("seller") && p("w") === a("wa"))
      .select($"p_id", $"name", $"w.start".as("w_start"))
      .distinct()
  }

  /** q9: winning bid per auction (max-price join, earliest on tie). */
  def q9(s: SparkSession): DataFrame = {
    import s.implicits._
    val joined = auctions(s)
      .join(bids(s), $"a_id" === $"auction" &&
        $"b_date_time".between($"a_date_time", $"expires"))
    val finals = joined.groupBy($"a_id".as("id")).agg(max($"price").as("final"))
    bids(s).join(finals, $"auction" === $"id" && $"price" === $"final")
      .select($"auction", $"bidder", $"price", $"b_date_time")
  }

  /** q10: bid log with date partitions (reference writes partitioned
    * files; here: the partition-derivation projection).
    */
  def q10(s: SparkSession): DataFrame = {
    import s.implicits._
    bids(s).select($"auction", $"bidder", $"price", $"b_date_time",
      date_format($"b_date_time", "yyyy-MM-dd").as("p_date"),
      hour($"b_date_time").as("p_hour"))
  }

  /** q11: bid sessions per bidder (10 s gap session windows). */
  def q11(s: SparkSession): DataFrame = {
    import s.implicits._
    bids(s)
      .groupBy(session_window($"b_date_time", "10 seconds").as("w"), $"bidder")
      .agg(count(lit(1)).as("bid_count"),
        min($"b_date_time").as("start_time"),
        max($"b_date_time").as("end_time"))
      .select($"bidder", $"bid_count", $"start_time", $"end_time")
  }

  /** q12: processing-time 10 s windows per bidder. */
  def q12(s: SparkSession): DataFrame = {
    import s.implicits._
    bids(s).withColumn("p_time", current_timestamp())
      .groupBy(window($"p_time", "10 seconds"), $"bidder")
      .agg(count(lit(1)).as("bid_count"),
        min($"p_time").as("start_time"),
        max($"p_time").as("end_time"))
      .select($"bidder", $"bid_count", $"start_time", $"end_time")
  }

  /** q13: bounded side-input join on auction mod 10000. */
  def q13(s: SparkSession): DataFrame = {
    import s.implicits._
    bids(s).join(broadcast(Nexmark.sideInput(s)),
        pmod($"auction", lit(10000)) === $"key")
      .select($"auction", $"bidder", $"price", $"b_date_time", $"value")
  }

  /** YSB: campaign view counts per tumbling 10 s window. */
  def ysb(s: SparkSession): DataFrame = {
    import s.implicits._
    val ev = Ysb.adEvents(s, N, Eps).toDF().filter($"event_type" === "view")
    ev.join(broadcast(Ysb.campaigns(s).toDF()), $"ad_id" === $"c_ad_id")
      .groupBy(window($"event_time", "10 seconds").as("w"), $"campaign_id")
      .agg(count(lit(1)).as("n_views"))
      .select($"w.start".as("w_start"), $"campaign_id", $"n_views")
  }
}
