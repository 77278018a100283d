package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import java.sql.Timestamp

/** Deterministic NEXMark event generator — a fresh Scala implementation of
  * the semantics described by the reference generator
  * (/root/reference/flock/src/datasource/nexmark/event.rs:83-97,
  * config.rs:122-144,248-279): person:auction:bid = 1:3:46, hot-seller /
  * hot-auction / hot-bidder skew, log-uniform prices, bounded in-flight
  * auction ids, 1 ms inter-event delay at 1000 events/s.
  *
  * We do NOT reproduce the reference's SmallRng byte stream (SURVEY §7
  * "What's hard" #1) — correctness is established against our own
  * generator via dual-formulation checks and invariants, not against the
  * reference's exact rows. RNG = splitmix64 seeded per event id, so any
  * executor can generate any event independently (embarrassingly parallel
  * `spark.range(n).map` — no driver-side data, scales to any n).
  */
object Nexmark {

  // Reference defaults (config.rs:122-144).
  val PersonProportion = 1
  val AuctionProportion = 3
  val BidProportion = 46
  val ProportionDenominator: Int = PersonProportion + AuctionProportion + BidProportion
  val ActivePeople = 1000
  val InFlightAuctions = 100
  val HotSellerRatio = 4
  val HotAuctionRatio = 2
  val HotBidderRatio = 4
  val HotRatio2 = 100
  val FirstAuctionId = 1000
  val FirstPersonId = 1000
  val FirstCategoryId = 10
  val PersonIdLead = 10
  val AuctionIdLead = 10
  val NumCategories = 5
  val BaseTime = 1_436_918_400_000L // reference BASE_TIME (2015-07-15)

  val UsStates: Vector[String] = Vector("az", "ca", "id", "or", "wa", "wy")
  val UsCities: Vector[String] = Vector("phoenix", "los angeles", "san francisco",
    "boise", "portland", "bend", "redmond", "seattle", "kent", "cheyenne")
  val FirstNames: Vector[String] = Vector("peter", "paul", "luke", "john", "saul",
    "vicky", "kate", "julie", "sarah", "deiter", "walter")
  val LastNames: Vector[String] = Vector("shultz", "abrams", "spencer", "white",
    "bartels", "walton", "smith", "jones", "noris")

  case class Person(p_id: Int, name: String, email_address: String,
      credit_card: String, city: String, state: String, p_date_time: Timestamp)
  case class Auction(a_id: Int, item_name: String, description: String,
      initial_bid: Int, reserve: Int, a_date_time: Timestamp,
      expires: Timestamp, seller: Int, category: Int)
  case class Bid(auction: Int, bidder: Int, price: Int, b_date_time: Timestamp)

  /** Small deterministic RNG (splitmix64 stream) seeded per event id. */
  final class Rng(seed: Long) {
    private var state = seed
    def nextLong(): Long = {
      state += 0x9E3779B97F4A7C15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    /** uniform in [0, bound) */
    def nextInt(bound: Int): Int = (Math.floorMod(nextLong(), bound.toLong)).toInt
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    def choose[T](v: Vector[T]): T = v(nextInt(v.length))
    def genString(n: Int): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < n) {
        val c = if (nextInt(13) == 0) ' ' else ('a' + nextInt(26)).toChar
        sb.append(c); i += 1
      }
      sb.result().trim
    }
    /** log-uniform price in cents: 10^(U*6) * 100 (event.rs:53-56). */
    def genPrice(): Int = math.round(math.pow(10.0, nextDouble() * 6.0) * 100.0).toInt
  }

  /** Event-time for event number i at `eventsPerSecond` (config.rs:248-259). */
  def eventTimestamp(i: Long, eventsPerSecond: Long): Long =
    BaseTime + i * 1000L / eventsPerSecond

  /** Kind of event i: 0 = person, 1 = auction, 2 = bid (event.rs:84-96). */
  def kindOf(i: Long): Int = {
    val rem = i % ProportionDenominator
    if (rem < PersonProportion) 0
    else if (rem < PersonProportion + AuctionProportion) 1
    else 2
  }

  /** Highest person id emitted at or before event id (event.rs last_id). */
  private def personLastId(id: Long): Long = {
    val epoch = id / ProportionDenominator
    val offset = math.min(id % ProportionDenominator, PersonProportion - 1L)
    epoch * PersonProportion + offset
  }

  private def personNextId(id: Long, rng: Rng): Long = {
    val people = personLastId(id) + 1
    val active = math.min(people, ActivePeople.toLong)
    people - active + rng.nextInt(active.toInt + PersonIdLead)
  }

  private def auctionLastId(id: Long): Long = {
    var epoch = id / ProportionDenominator
    var offset = id % ProportionDenominator
    if (offset < PersonProportion) { epoch -= 1; offset = AuctionProportion - 1 }
    else if (offset >= PersonProportion + AuctionProportion) offset = AuctionProportion - 1
    else offset -= PersonProportion
    epoch * AuctionProportion + offset
  }

  private def auctionNextId(id: Long, rng: Rng): Long = {
    val maxA = auctionLastId(id)
    val minA = math.max(0L, maxA - InFlightAuctions)
    minA + rng.nextInt((maxA - minA + 1 + AuctionIdLead).toInt)
  }

  def genPerson(id: Long, eps: Long): Person = {
    val rng = new Rng(id)
    Person(
      p_id = (personLastId(id) + FirstPersonId).toInt,
      name = s"${rng.choose(FirstNames)} ${rng.choose(LastNames)}",
      email_address = s"${rng.genString(7)}@${rng.genString(5)}.com",
      credit_card = (0 until 4).map(_ => f"${rng.nextInt(10000)}%04d").mkString(" "),
      city = rng.choose(UsCities),
      state = rng.choose(UsStates),
      p_date_time = new Timestamp(eventTimestamp(id, eps)))
  }

  def genAuction(id: Long, eps: Long): Auction = {
    val rng = new Rng(id)
    val initialBid = rng.genPrice()
    val time = eventTimestamp(id, eps)
    val seller =
      if (rng.nextInt(HotSellerRatio) > 0) (personLastId(id) / HotRatio2) * HotRatio2
      else personNextId(id, rng)
    // expires ~ U(1, 2 * horizon) past event time, where horizon is the
    // event-time span over which InFlightAuctions more auctions appear.
    val eventsForAuctions = InFlightAuctions.toLong * ProportionDenominator / AuctionProportion
    val horizon = math.max(eventTimestamp(id + eventsForAuctions, eps) - time, 1L)
    Auction(
      a_id = (auctionLastId(id) + FirstAuctionId).toInt,
      item_name = rng.genString(20),
      description = rng.genString(100),
      initial_bid = initialBid,
      reserve = initialBid + rng.genPrice(),
      a_date_time = new Timestamp(time),
      expires = new Timestamp(time + 1 + rng.nextInt((horizon * 2).toInt)),
      seller = (seller + FirstPersonId).toInt,
      category = FirstCategoryId + rng.nextInt(NumCategories))
  }

  def genBid(id: Long, eps: Long): Bid = {
    val rng = new Rng(id)
    val auction =
      if (rng.nextInt(HotAuctionRatio) > 0) (auctionLastId(id) / HotRatio2) * HotRatio2
      else auctionNextId(id, rng)
    val bidder =
      if (rng.nextInt(HotBidderRatio) > 0) (personLastId(id) / HotRatio2) * HotRatio2
      else personNextId(id, rng)
    Bid(
      auction = (auction + FirstAuctionId).toInt,
      bidder = (bidder + FirstPersonId).toInt,
      price = rng.genPrice(),
      b_date_time = new Timestamp(eventTimestamp(id, eps)))
  }

  /** Partition count for generating n events: one slice per ~50k events,
    * capped at the session's core count. Events are ~100 B, so a slice is
    * a few MB of output — generation is per-id seeded (any slicing yields
    * identical rows), and right-sizing slices to the DATA VOLUME instead
    * of inheriting `spark.range`'s default (always defaultParallelism)
    * stops a 46k-row catalog run from fanning every downstream stage into
    * 32 tasks of ~1.4k rows each, where per-task fixed cost dominates
    * (guide §2.2 "fewer, larger partitions"). Large n still spreads over
    * every core.
    */
  def genSlices(spark: SparkSession, n: Long): Int =
    math.max(1L, math.min(n / 50000L,
      spark.sparkContext.defaultParallelism.toLong)).toInt

  /** Distributed generation: ids 0..n over `spark.range` partitions. */
  def persons(spark: SparkSession, n: Long, eps: Long = 1000): Dataset[Person] = {
    import spark.implicits._
    spark.range(0, n, 1, genSlices(spark, n))
      .filter(i => kindOf(i) == 0).map(i => genPerson(i, eps))
  }

  def auctions(spark: SparkSession, n: Long, eps: Long = 1000): Dataset[Auction] = {
    import spark.implicits._
    spark.range(0, n, 1, genSlices(spark, n))
      .filter(i => kindOf(i) == 1).map(i => genAuction(i, eps))
  }

  def bids(spark: SparkSession, n: Long, eps: Long = 1000): Dataset[Bid] = {
    import spark.implicits._
    spark.range(0, n, 1, genSlices(spark, n))
      .filter(i => kindOf(i) == 2).map(i => genBid(i, eps))
  }

  /** q13 side input: key = 0..10000, value = key (actor.rs:575-629 loads a
    * small static CSV; semantics = bounded key→value map).
    */
  def sideInput(spark: SparkSession, n: Int = 10000): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, genSlices(spark, n))
      .select($"id".cast("int").as("key"), $"id".cast("int").as("value"))
  }
}

/** YSB generator — ad events + static campaign map, fresh implementation of
  * the semantics in /root/reference/flock/src/datasource/ysb/{event,generator}.rs:
  * 100 campaigns × 10 ads each; events cycle ad ids; event_type rotates
  * view/click/purchase.
  */
object Ysb {
  import java.sql.Timestamp

  case class AdEvent(user_id: String, page_id: String, ad_id: String,
      ad_type: String, event_type: String, event_time: Timestamp, ip_address: String)
  case class Campaign(c_ad_id: String, campaign_id: String)

  private val AdTypes = Vector("banner", "modal", "sponsored-search", "mail", "mobile")
  private val EventTypes = Vector("view", "click", "purchase")

  def campaigns(spark: SparkSession, nCampaigns: Int = 100): Dataset[Campaign] = {
    import spark.implicits._
    spark.range(0, nCampaigns.toLong * 10, 1,
        Nexmark.genSlices(spark, nCampaigns.toLong * 10)).map { i =>
      Campaign(c_ad_id = s"ad-${i}", campaign_id = s"campaign-${i / 10}")
    }
  }

  def adEvents(spark: SparkSession, n: Long, eps: Long = 1000): Dataset[AdEvent] = {
    import spark.implicits._
    spark.range(0, n, 1, Nexmark.genSlices(spark, n)).map { i =>
      val rng = new Nexmark.Rng(i)
      AdEvent(
        user_id = f"user-${rng.nextInt(1000)}%04d",
        page_id = f"page-${rng.nextInt(100)}%03d",
        ad_id = s"ad-${rng.nextInt(1000)}",
        ad_type = rng.choose(AdTypes),
        event_type = rng.choose(EventTypes),
        event_time = new Timestamp(Nexmark.eventTimestamp(i, eps)),
        ip_address = s"${rng.nextInt(256)}.${rng.nextInt(256)}.${rng.nextInt(256)}.${rng.nextInt(256)}")
    }
  }
}
