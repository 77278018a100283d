package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time window operators over the `events` table — the batch analogs
  * of Flock's window drivers (SURVEY §2.9, reference
  * flock-function/src/aws/window/{tumbling,hopping,session,global}.rs).
  *
  * Spark-first: `window()` / `session_window()` group-bys compile to a
  * single hash-aggregate over an event-time bucket expression — no custom
  * state machine needed in batch. The streaming variants (with watermarks,
  * Flock has none — SURVEY §2.9 "late data") live in graft.streaming.
  *
  * Window starts are emitted as formatted strings (see Relational's
  * conventions) and oracles reproduce Spark's epoch-aligned bucketing with
  * arithmetic on `epoch(ts)`.
  */
object Windows {

  type Q = (SparkSession, String) => DataFrame

  /** Banded interval self-join: event pairs of the same user within one
    * hour of each other. The scale path for time-proximity joins: each
    * event lands in time bucket t/1h and joins buckets {b−1, b, b+1} of
    * its user — equi-join on (user, bucket) + exact residual — instead of
    * the quadratic theta join a naive |t1−t2| ≤ 1h predicate plans to.
    */
  private def qIntervalJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = 3600000L
    val ev = graft.Tables(s, d, "events").filter($"event_id" % 3 === 0)
      .select($"event_id", $"user_id", $"ts",
        // integer bucket: Column./ is double division, which would make
        // every bucket fractional-unique and the equi-join vacuous
        expr(s"unix_millis(ts) div $w").as("bucket"))
    // probe b−1/b/b+1: any pair within the band differs by at most one
    // bucket in either direction (id order does not imply time order)
    val probed = ev.select($"event_id".as("id2"), $"user_id".as(("u2")),
      $"ts".as("ts2"),
      explode(array($"bucket" - 1, $"bucket", $"bucket" + 1)).as("b2"))
    ev.join(probed,
        $"user_id" === $"u2" && $"bucket" === $"b2" && $"event_id" < $"id2")
      .filter(abs(unix_millis($"ts") - unix_millis($"ts2")) <= w)
      .select($"user_id", $"event_id".as("id1"), $"id2",
        (unix_millis($"ts2") - unix_millis($"ts")).as("gap_ms"))
      .distinct()
      .orderBy($"user_id", $"id1", $"id2")
  }

  /** Pure inequality join (no equi key): pairs of sampled events where
    * the first precedes the second in time yet carries the larger value —
    * the dominance/skyline query shape. Runs on the native IEJoin-style
    * operator (plans.InequalityJoin): Spark's own planner would pick
    * BroadcastNestedLoopJoin, O(|A|·|B|) per partition; the sweep is
    * O((|A|+|B|) log |A| + output).
    */
  private def qInequalityJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = graft.Tables(s, d, "events")
    val a = ev.filter($"event_id" % 101 === 0)
      .select($"event_id".as("id1"), $"ts".as("ts1"), $"value".as("v1"))
    val b = ev.filter($"event_id" % 103 === 0)
      .select($"event_id".as("id2"), $"ts".as("ts2"), $"value".as("v2"))
    graft.plans.InequalityJoinOp.ieJoin(a, b,
        ("ts1", "<", "ts2"), ("v1", ">", "v2"))
      .select($"id1", $"id2", ($"v1" - $"v2").as("v_gap"))
      .orderBy($"id1", $"id2")
  }

  /** Vocabulary heavy hitters: exact top-20 tokens by corpus frequency
    * (explode → count → top-k; ties broken by token). The pipeline op
    * behind vocabulary building / stopword mining.
    */
  private def qTopTokens(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.Tables(s, d, "documents")
      .select(explode(split($"text", "\\s+")).as("token"))
      .groupBy($"token")
      .agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"token")
      .limit(20)
  }

  /** Funnel analysis — how many users completed view → click → purchase
    * with each step at most 1 hour after the previous (the ClickHouse
    * `windowFunnel` / Flink-CEP sequence-match shape, expressed
    * relationally). Semantics: a user reaches depth k if there EXISTS a
    * strictly-time-increasing chain of the first k step types with every
    * gap ≤ 1h — computed as chained semi-joins, which is exactly the
    * existential DP without enumerating chains.
    *
    * Scale: each stage is a semi-join keyed by user (equi on user_id,
    * range residual on ts), so everything co-partitions on one user
    * shuffle and per-stage output only shrinks (semi-join ⇒ no pair
    * blowup when a user has many events). At 100 TB this is the funnel
    * shape that works; per-user collect_list+fold state is the
    * alternative only when chains need full reconstruction.
    */
  private def qFunnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = graft.Tables(s, d, "events")
      .select($"user_id", $"ts", $"event_type")
    def step(t: String) = ev.filter($"event_type" === t)
      .select($"user_id", $"ts")
    def chain(next: DataFrame, prev: DataFrame): DataFrame =
      next.as("n").join(prev.as("p"),
          col("n.user_id") === col("p.user_id") &&
            col("n.ts") > col("p.ts") &&
            col("n.ts") <= col("p.ts") + expr("INTERVAL 1 HOUR"),
          "leftsemi")
    val s1 = step("view")
    val s2 = chain(step("click"), s1)
    val s3 = chain(step("purchase"), s2)
    Seq(("1_view", s1), ("2_view_click", s2), ("3_view_click_purchase", s3))
      .map { case (name, df) =>
        df.agg(countDistinct($"user_id").as("n_users"))
          .select(lit(name).as("step"), $"n_users")
      }
      .reduce(_ unionByName _)
      .orderBy($"step")
  }

  def defs: Map[String, Q] = Map(
    "q22_tumbling_window" -> ((s, d) => q22(s, d)),
    "q23_hopping_window" -> ((s, d) => q23(s, d)),
    "q24_session_window" -> ((s, d) => q24(s, d)),
    "q25_ysb_campaign" -> ((s, d) => q25(s, d)),
    "q26_json_extract" -> ((s, d) => q26(s, d)),
    "q27_proctime_global" -> ((s, d) => q27(s, d)),
    "q59_rows_window" -> ((s, d) => q59(s, d)),
    "q67_interval_join" -> ((s, d) => qIntervalJoin(s, d)),
    "q68_top_tokens" -> ((s, d) => qTopTokens(s, d)),
    "q108_funnel" -> ((s, d) => qFunnel(s, d)),
    "q69_inequality_join" -> ((s, d) => qInequalityJoin(s, d)),
    "q113_cohort_retention" -> ((s, d) => qRetention(s, d)),
    "q114_gap_fill" -> ((s, d) => qGapFill(s, d)),
    "q115_session_stats" -> ((s, d) => qSessionStats(s, d)),
    "q116_transition_matrix" -> ((s, d) => qTransitions(s, d)),
    "q118_analytic_extras" -> ((s, d) => qAnalyticExtras(s, d)),
    "q123_burst_detection" -> ((s, d) => qBurst(s, d)),
    "q130_rows_sliding" -> ((s, d) => qRowsSliding(s, d)),
    "q141_lasttouch_attribution" -> ((s, d) => qAttribution(s, d))
  )

  /** Last-touch attribution — revenue credit assignment, the canonical
    * event-analytics join of marketing pipelines: each purchase credits
    * its user's most recent click at-or-before it (clicks order before
    * purchases on timestamp ties; `event_id` totalizes the order), and
    * the credit expires after a 7-day lookback — stale or absent clicks
    * land in the `-1` unattributed bucket. The channel is the click's
    * `props.k`. Revenue rides integer cents (per-row floor quantization,
    * the engine's money scheme) and the recency test is exact micros
    * arithmetic, so the rollup is bit-identical cross-engine.
    *
    * Scale: ONE user-keyed exchange — the carry of "latest click so
    * far" is a running `last(..., ignoreNulls)` over a ROWS frame, i.e.
    * a single sort + linear pass per user partition, not an as-of join
    * (no second relation, no range-join blowup); the channel rollup
    * then shuffles one row per purchase. Per-user event counts bound
    * the partition, so skew follows user activity, not corpus size.
    */
  private def qAttribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val sevenDaysUs = 7L * 24 * 3600 * 1000000L
    val e = graft.Tables(s, d, "events")
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .withColumn("kind",
        when($"event_type" === "click", 0)
          .when($"event_type" === "purchase", 1).otherwise(2))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"kind", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("lc",
        last(when($"kind" === 0, struct($"ts".as("cts"), $"k".as("ck"))),
          ignoreNulls = true).over(w))
      .filter($"kind" === 1)
      .withColumn("channel",
        when($"lc".isNull, -1L)
          .when(unix_micros($"ts") - unix_micros($"lc.cts") > sevenDaysUs, -1L)
          .otherwise($"lc.ck"))
      .withColumn("cents",
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .groupBy($"channel")
      .agg(count(lit(1)).as("n_purchases"), sum($"cents").as("revenue_cents"))
      .orderBy($"channel")
  }

  /** Rows-schedule sliding window (reference `Window::Sliding` +
    * `Schedule::Rows`, flock/src/stream/window.rs:39-113 — declared there,
    * never executed): per user, over the arrival order (`event_id` is the
    * unique arrival sequence, so the order is total and both engines
    * frame identically), every `slide`-th row emits aggregates over its
    * trailing `size`-row frame. Value sums ride integer cents; the
    * per-frame mean is a floor division of positive longs — safe because
    * `value` ≥ 0 (Spark `div` truncates, DuckDB `//` floors; they agree
    * only on non-negatives).
    *
    * Scale: one shuffle keyed by user; row_number and both frame
    * aggregates share the single (user, event_id) sort, and ROWS frames
    * evaluate with an O(1)-per-row slide. The emit filter is applied
    * before the final projection, so only 1/slide of rows survive the
    * window stage. Streaming sibling: StreamOps.rowsSlidingStream.
    */
  private def qRowsSliding(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val size = 50
    val slide = 10
    val w = Window.partitionBy($"user_id").orderBy($"event_id")
    val f = w.rowsBetween(-(size - 1), 0)
    graft.Tables(s, d, "events")
      .select($"user_id", $"event_id",
        expr("CAST(floor(value * 100 + 0.5001) AS BIGINT)").as("cents"))
      .withColumn("seq", row_number().over(w).cast("long"))
      .withColumn("n_in_window", count(lit(1)).over(f).cast("long"))
      .withColumn("sum_cents", sum($"cents").over(f).cast("long"))
      .filter($"seq" % slide === 0)
      .select($"user_id", $"seq", $"n_in_window", $"sum_cents",
        expr("CAST(sum_cents DIV n_in_window AS BIGINT)").as("avg_cents"))
      .orderBy($"user_id", $"seq")
  }

  /** Burst detection via RANGE-interval frames — the rate-limit /
    * abuse-monitoring query: each event sees its trailing (t−1h, t]
    * VALUE-based window (RANGE frame over epoch-ms, not ROWS — peers at
    * the same timestamp count together in both engines), and per user we
    * report the peak rolling count and the earliest time it was hit.
    * The argmin rides a packed struct max — (count, −ms) — so no second
    * window pass is needed.
    *
    * Scale: one window shuffle keyed by user; RANGE frames evaluate
    * with a sliding two-pointer over each partition (linear, no
    * re-scan per row). The streaming sibling is hoppingCounts; this is
    * the exact-trailing-window batch form.
    */
  private def qBurst(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = graft.Tables(s, d, "events")
      .select($"user_id", unix_millis($"ts").as("ms"))
    val w = Window.partitionBy($"user_id").orderBy($"ms")
      .rangeBetween(-3599999L, 0L)
    ev.withColumn("c1h", count(lit(1)).over(w).cast("long"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        max(struct($"c1h".as("c"), (-$"ms").as("negms"))).as("b"))
      .select($"user_id", $"n_events", $"b.c".as("max_burst"),
        (-$"b.negms").as("at_ms"))
      .orderBy($"user_id")
  }

  /** The remaining SQL analytic window functions in one oracled query:
    * ntile(10) deciles, percent_rank, cume_dist, and nth_value over the
    * per-language (n_chars, doc_id) TOTAL order — ties broken by the
    * unique id, because ntile assigns by row position and any
    * nondeterminism in the order would diverge between engines.
    * percent_rank/cume_dist are emitted as exact IEEE quotients of small
    * integers (no rounding) — both engines compute the same division, so
    * the hash compare is still exact. Deciles then aggregate to
    * per-(lang, decile) stats so the result is small and stable.
    *
    * Scale: one window shuffle keyed by lang; the decile aggregation
    * reuses the same partitioning. ntile's frame is the whole partition
    * — at 100 TB deciles come from the mergeable histogram (q96) instead;
    * this is the exact-rank path for partition-sized groups.
    */
  private def qAnalyticExtras(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"lang").orderBy($"n_chars", $"doc_id")
    val scored = graft.Tables(s, d, "documents")
      .select($"lang", $"doc_id", $"n_chars")
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("first_id",
        nth_value($"doc_id", 1).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    scored.groupBy($"lang", $"decile")
      .agg(count(lit(1)).as("n_docs"),
        min($"n_chars").as("min_chars"), max($"n_chars").as("max_chars"),
        max($"pr").as("max_pr"), max($"cd").as("max_cd"),
        min($"first_id").as("first_id"))
      .orderBy($"lang", $"decile")
  }

  /** Batch sessionization by inactivity gap — the lag-mark-cumsum
    * islands formulation (30-minute gap), reduced to corpus-level
    * session statistics. Complements q24 (streaming-style
    * `session_window`): this is the shape used when sessionizing
    * historical data where the session id must be JOINABLE back to
    * events (the window columns stay available), and the oracle replays
    * it exactly because every value is integer milliseconds — both
    * engines floor the same nanosecond source to ms.
    *
    * Scale: two windows over the same (user_id, ts) ordering — Spark
    * evaluates them in ONE sort within one shuffle keyed by user; the
    * session reduction reuses that partitioning. Nothing global until
    * the final 1-row aggregate of per-session rows.
    */
  private def qSessionStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val gapMs = 30L * 60 * 1000
    val ev = graft.Tables(s, d, "events")
      .select($"user_id", unix_millis($"ts").as("ms"))
    val w = Window.partitionBy($"user_id").orderBy($"ms")
    val sess = ev.withColumn("prev", lag($"ms", 1).over(w))
      .withColumn("new_sess",
        when($"prev".isNull || $"ms" - $"prev" > gapMs, 1L).otherwise(0L))
      .withColumn("sess_id", sum($"new_sess").over(w))
      .groupBy($"user_id", $"sess_id")
      .agg(count(lit(1)).as("n_events"),
        ((max($"ms") - min($"ms")) / lit(1000L)).cast("long").as("span_s"))
    sess.agg(countDistinct($"user_id").as("n_users"),
      count(lit(1)).as("n_sessions"),
      sum($"n_events").as("n_events"),
      expr("sum(n_events) div count(1)").as("avg_events_per_session"),
      expr("sum(span_s) div count(1)").as("avg_span_s"),
      max($"n_events").as("max_events"),
      max($"span_s").as("max_span_s"))
  }

  /** Event-type transition matrix — per-user next-event pairs (lead over
    * the (ts, event_id) total order) counted into a first-order Markov
    * matrix with integer-permille row normalization: the behavioral
    * sequence model behind "what follows a view", and the aggregate the
    * q108 funnel and q115 sessions both sit on top of. The event_id
    * tiebreak makes the per-user order total, so both engines count the
    * same transitions even for same-millisecond events.
    *
    * Scale: one window shuffle keyed by user; the matrix is
    * |event_types|² rows, so the normalization join is over a relation
    * that no longer depends on data size.
    */
  private def qTransitions(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ev = graft.Tables(s, d, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val tr = ev.withColumn("to_type", lead($"event_type", 1).over(w))
      .filter($"to_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"to_type")
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy($"from_type")
    tr.withColumn("row_total", sum($"n").over(wf))
      .withColumn("permille", expr("n * 1000 div row_total"))
      .select($"from_type", $"to_type", $"n", $"permille")
      .orderBy($"from_type", $"to_type")
  }

  /** Activity-gap analysis over a per-user date spine — the time-series
    * gap-fill shape (generate the missing days, then reason about them).
    * Two independent formulations are emitted in ONE result and must
    * reconcile: rows gap_len ≥ 1 are the islands-and-gaps histogram
    * (lead-window day deltas, n_gaps runs of exactly that length and the
    * users having one); the gap_len = 0 row counts every inactive day
    * via the explicit spine — `sequence(first, last)` exploded per user,
    * anti-joined against activity — so Σ gap_len·n_gaps = that total by
    * construction (the spec asserts it).
    *
    * Scale: the spine is bounded by users × span (not events), explodes
    * from a per-user 2-column relation, and the anti-join + windows all
    * key by user — one co-partitioned shuffle family. This is the
    * production gap-fill plan; a calendar cross-join would shuffle the
    * full spine against the corpus instead.
    */
  private def qGapFill(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val ud = graft.Tables(s, d, "events")
      .select($"user_id", to_date($"ts").as("day"))
      .distinct()
    val w = Window.partitionBy($"user_id").orderBy($"day")
    val gapHist = ud.withColumn("nxt", lead($"day", 1).over(w))
      .withColumn("gap", (datediff($"nxt", $"day") - 1).cast("long"))
      .filter($"gap" >= 1)
      .groupBy($"gap".as("gap_len"))
      .agg(count(lit(1)).as("n_gaps"), countDistinct($"user_id").as("n_users"))
    val spine = ud.groupBy($"user_id")
      .agg(min($"day").as("f"), max($"day").as("l"))
      .select($"user_id", explode(expr("sequence(f, l)")).as("day"))
    val inactive = spine.join(ud, Seq("user_id", "day"), "left_anti")
    val total = inactive.agg(count(lit(1)).as("n_gaps"),
        countDistinct($"user_id").as("n_users"))
      .select(lit(0L).as("gap_len"), $"n_gaps", $"n_users")
    gapHist.unionByName(total).orderBy($"gap_len")
  }

  /** Cohort retention matrix — users grouped by first-activity day
    * (their cohort), with distinct-user counts re-active at day offsets
    * 0/1/2/3/7 (the ClickHouse `retention` / product-analytics shape,
    * and q108's funnel sibling: funnel = ordered steps within one
    * window, retention = recurring activity across days).
    *
    * Scale: activity is first collapsed to distinct (user, day) — one
    * shuffle keyed by user — and the first-day aggregate co-partitions
    * with the self-join on the same key, so no second shuffle of the
    * event volume. The offset counts are conditional count-distincts in
    * ONE aggregation pass (Spark's Expand: ×5 of the already-tiny
    * user-day relation, not of raw events); cohort day is emitted as a
    * string to dodge cross-engine date-encoding drift.
    */
  private def qRetention(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ud = graft.Tables(s, d, "events")
      .select($"user_id", to_date($"ts").as("day"))
      .distinct()
    val first = ud.groupBy($"user_id").agg(min($"day").as("cohort"))
    val offs = ud.join(first, "user_id")
      .withColumn("k", datediff($"day", $"cohort"))
    def ret(k: Int) =
      countDistinct(when($"k" === k, $"user_id")).as(s"d$k")
    offs.groupBy(date_format($"cohort", "yyyy-MM-dd").as("cohort"))
      .agg(countDistinct($"user_id").as("n_users"),
        ret(0), ret(1), ret(2), ret(3), ret(7))
      .orderBy($"cohort")
  }

  /** Row-count windows — the reference's Schedule::Rows trigger
    * (flock/src/stream/window.rs:39-76, declared for Sliding/Stagger but
    * never executed there): per key, consecutive blocks of 20 events in
    * event-time order form one window.
    */
  private def q59(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables(s, d, "events")
      .withColumn("rn", row_number().over(w))
      .withColumn("win", (($"rn" - 1) / 20).cast("long"))
      .groupBy($"user_id", $"win")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value"), 4).as("sum_value"))
      .orderBy($"user_id", $"win")
  }

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  /** Tumbling(1h) per event_type — Flock Tumbling (tumbling.rs:31-188). */
  private def q22(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "events")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value"), 2).as("sum_value"))
      .select(date_format($"w.start", fmt).as("w_start"), $"event_type",
        $"n_events", $"sum_value")
      .orderBy($"w_start", $"event_type")
  }

  /** Hopping(1h, 30m) — overlapping windows (hopping.rs:54-121). Each event
    * lands in exactly w/hop = 2 windows.
    */
  private def q23(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "events")
      .groupBy(window($"ts", "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value"), 2).as("sum_value"))
      .select(date_format($"w.start", fmt).as("w_start"), $"n_events", $"sum_value")
      .orderBy($"w_start")
  }

  /** Session(6h gap) keyed by user — Flock Session (session.rs:64-179).
    * Spark's session_window merges events while the next event falls before
    * current session end (start + gap, half-open).
    */
  private def q24(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "events")
      .groupBy(session_window($"ts", "6 hours").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value"), 2).as("sum_value"))
      .select($"user_id", date_format($"w.start", fmt).as("s_start"),
        $"n_events", $"sum_value")
      .orderBy($"user_id", $"s_start")
  }

  /** YSB analog (reference benchmarks/src/ysb/ysb.sql): filter one event
    * type, broadcast-join the (small) campaign-like dim, tumbling count.
    */
  private def q25(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dim = Tables(s, d, "customer").select($"c_custkey", $"c_mktsegment")
    Tables(s, d, "events")
      .filter($"event_type" === "view")
      .join(broadcast(dim), $"user_id" === $"c_custkey")
      .groupBy(window($"ts", "1 day").as("w"), $"c_mktsegment")
      .agg(count(lit(1)).as("n_views"))
      .select(date_format($"w.start", fmt).as("w_start"), $"c_mktsegment", $"n_views")
      .orderBy($"w_start", $"c_mktsegment")
  }

  /** Scalar JSON extraction at ingest (reference parses JSON event bytes
    * against a schema — transmute.rs:255-266; here: a JSON props column).
    */
  private def q26(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "events")
      .filter($"event_id" % 97 === 0)
      .select($"event_id",
        get_json_object($"props", "$.k").cast("long").as("k"),
        $"event_type")
      .orderBy($"event_id")
  }

  /** Processing-time tumbling window analog (NEXMark q12, global.rs:42-148):
    * stamp p_time at ingest, window on the stamp. The clock is injectable
    * ([[graft.functions.ProcTime]]): wall clock in production; under
    * spark.graft.proctime.mode=deterministic a paced-replay arrival model
    * (event time + 2 s constant pipeline latency), which makes the output
    * a pure function of the input and therefore DuckDB-oracle-checkable —
    * SURVEY §7's "processing-time determinism" hard point. The +2 s shift
    * de-aligns window boundaries from the event-time hour grid, so this is
    * NOT q22 under another name: events near hour edges land differently.
    */
  private def q27(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "events")
      .withColumn("p_time", graft.functions.ProcTime.stamp(
        s, $"ts" + expr("INTERVAL 2 SECONDS")))
      .groupBy(window($"p_time", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
      .select(date_format($"w.start", fmt).as("w_start"), $"event_type",
        $"n_events")
      .orderBy($"w_start", $"event_type")
  }

  def oracles: Map[String, String] = Map(
    "q141_lasttouch_attribution" ->
      """WITH e AS (
           SELECT event_id, ts, user_id, event_type, value,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             CASE WHEN event_type = 'click' THEN 0
                  WHEN event_type = 'purchase' THEN 1 ELSE 2 END AS kind
           FROM events),
         w AS (
           SELECT *,
             last_value(CASE WHEN kind = 0
                 THEN struct_pack(cts := ts, ck := k) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, kind, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lc
           FROM e),
         p AS (
           SELECT CASE WHEN lc IS NULL THEN -1
                       WHEN epoch_us(ts) - epoch_us(lc.cts) > 604800000000
                         THEN -1
                       ELSE lc.ck END AS channel,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM w WHERE kind = 1)
         SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
         FROM p GROUP BY 1 ORDER BY 1""",
    "q123_burst_detection" ->
      """WITH ev AS (
           SELECT user_id, epoch_ns(ts) // 1000000 AS ms FROM events),
         r AS (
           SELECT user_id, ms,
             count(*) OVER (PARTITION BY user_id ORDER BY ms
               RANGE BETWEEN 3599999 PRECEDING AND CURRENT ROW) AS c
           FROM ev),
         m AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(max(c) AS BIGINT) AS max_burst
           FROM r GROUP BY 1),
         a AS (
           SELECT r.user_id, CAST(min(r.ms) AS BIGINT) AS at_ms
           FROM r JOIN m ON r.user_id = m.user_id AND r.c = m.max_burst
           GROUP BY 1)
         SELECT m.user_id, n_events, max_burst, at_ms
         FROM m JOIN a ON m.user_id = a.user_id ORDER BY 1""",
    "q118_analytic_extras" ->
      """WITH s AS (
           SELECT lang, doc_id, n_chars,
             ntile(10) OVER w AS decile,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd,
             nth_value(doc_id, 1) OVER
               (PARTITION BY lang ORDER BY n_chars, doc_id
                ROWS UNBOUNDED PRECEDING) AS first_id
           FROM documents
           WINDOW w AS (PARTITION BY lang ORDER BY n_chars, doc_id))
         SELECT lang, CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars,
           max(pr) AS max_pr, max(cd) AS max_cd,
           CAST(min(first_id) AS BIGINT) AS first_id
         FROM s GROUP BY 1, 2 ORDER BY 1, 2""",
    "q115_session_stats" ->
      """WITH ev AS (
           SELECT user_id, epoch_ns(ts) // 1000000 AS ms FROM events),
         m AS (
           SELECT user_id, ms,
             CASE WHEN ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms)
                    > 1800000
                  OR lag(ms) OVER (PARTITION BY user_id ORDER BY ms) IS NULL
             THEN 1 ELSE 0 END AS new_sess
           FROM ev),
         sm AS (
           SELECT user_id, ms,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms
               ROWS UNBOUNDED PRECEDING) AS sess_id
           FROM m),
         sess AS (
           SELECT user_id, sess_id, CAST(count(*) AS BIGINT) AS n_events,
             (max(ms) - min(ms)) // 1000 AS span_s
           FROM sm GROUP BY 1, 2)
         SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(sum(n_events) // count(*) AS BIGINT) AS avg_events_per_session,
           CAST(sum(span_s) // count(*) AS BIGINT) AS avg_span_s,
           CAST(max(n_events) AS BIGINT) AS max_events,
           CAST(max(span_s) AS BIGINT) AS max_span_s
         FROM sess""",
    "q116_transition_matrix" ->
      """WITH tr AS (
           SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_ns(ts) // 1000, event_id) AS to_type
           FROM events),
         c AS (
           SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
           FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n,
           CAST(n * 1000 // sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS permille
         FROM c ORDER BY from_type, to_type""",
    "q130_rows_sliding" ->
      """WITH ev AS (
           SELECT user_id, event_id,
             CAST(floor(value * 100 + 0.5001) AS BIGINT) AS cents
           FROM events),
         wd AS (
           SELECT user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS seq,
             count(*) OVER w AS n_in_window,
             sum(cents) OVER w AS sum_cents
           FROM ev
           WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 49 PRECEDING AND CURRENT ROW))
         SELECT user_id, CAST(seq AS BIGINT) AS seq,
           CAST(n_in_window AS BIGINT) AS n_in_window,
           CAST(sum_cents AS BIGINT) AS sum_cents,
           CAST(sum_cents // n_in_window AS BIGINT) AS avg_cents
         FROM wd WHERE seq % 10 = 0 ORDER BY user_id, seq""",
    "q114_gap_fill" ->
      """WITH ud AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         g AS (
           SELECT user_id,
             datediff('day', day,
               lead(day) OVER (PARTITION BY user_id ORDER BY day)) - 1 AS gap
           FROM ud),
         hist AS (
           SELECT CAST(gap AS BIGINT) AS gap_len,
             CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
           FROM g WHERE gap >= 1 GROUP BY 1),
         fl AS (SELECT user_id, min(day) AS f, max(day) AS l
                FROM ud GROUP BY 1),
         spine AS (
           SELECT user_id,
             CAST(unnest(generate_series(f, l, INTERVAL 1 DAY)) AS DATE) AS day
           FROM fl),
         inact AS (
           SELECT s.user_id, s.day FROM spine s
           LEFT JOIN ud ON ud.user_id = s.user_id AND ud.day = s.day
           WHERE ud.user_id IS NULL),
         tot AS (
           SELECT CAST(0 AS BIGINT) AS gap_len,
             CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
           FROM inact)
         SELECT * FROM hist UNION ALL SELECT * FROM tot ORDER BY gap_len""",
    "q113_cohort_retention" ->
      """WITH ud AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         f AS (SELECT user_id, min(day) AS cohort FROM ud GROUP BY 1),
         o AS (
           SELECT ud.user_id, f.cohort,
             datediff('day', f.cohort, ud.day) AS k
           FROM ud JOIN f ON ud.user_id = f.user_id)
         SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT CASE WHEN k = 0 THEN user_id END) AS BIGINT) AS d0,
           CAST(count(DISTINCT CASE WHEN k = 1 THEN user_id END) AS BIGINT) AS d1,
           CAST(count(DISTINCT CASE WHEN k = 2 THEN user_id END) AS BIGINT) AS d2,
           CAST(count(DISTINCT CASE WHEN k = 3 THEN user_id END) AS BIGINT) AS d3,
           CAST(count(DISTINCT CASE WHEN k = 7 THEN user_id END) AS BIGINT) AS d7
         FROM o GROUP BY 1 ORDER BY 1""",
    "q108_funnel" ->
      """WITH v AS (
           SELECT user_id, ts FROM events WHERE event_type = 'view'),
         c AS (
           SELECT user_id, ts FROM events WHERE event_type = 'click'),
         p AS (
           SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
         s2 AS (
           SELECT c.user_id, c.ts FROM c WHERE EXISTS (
             SELECT 1 FROM v WHERE v.user_id = c.user_id
               AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR)),
         s3 AS (
           SELECT p.user_id FROM p WHERE EXISTS (
             SELECT 1 FROM s2 WHERE s2.user_id = p.user_id
               AND p.ts > s2.ts AND p.ts <= s2.ts + INTERVAL 1 HOUR))
         SELECT '1_view' AS step,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM v
         UNION ALL
         SELECT '2_view_click',
           CAST(count(DISTINCT user_id) AS BIGINT) FROM s2
         UNION ALL
         SELECT '3_view_click_purchase',
           CAST(count(DISTINCT user_id) AS BIGINT) FROM s3
         ORDER BY step""",
    "q67_interval_join" ->
      """WITH ev AS (
           SELECT event_id, user_id, ts FROM events WHERE event_id % 3 = 0)
         SELECT a.user_id, a.event_id AS id1, b.event_id AS id2,
           epoch_ms(b.ts) - epoch_ms(a.ts) AS gap_ms
         FROM ev a JOIN ev b
           ON a.user_id = b.user_id AND a.event_id < b.event_id
           AND abs(epoch_ms(a.ts) - epoch_ms(b.ts)) <= 3600000
         ORDER BY a.user_id, id1, id2""",
    "q68_top_tokens" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS freq
         FROM (SELECT unnest(string_split_regex(text, '\s+')) AS token
               FROM documents)
         GROUP BY 1 ORDER BY freq DESC, token LIMIT 20""",
    "q69_inequality_join" ->
      """WITH a AS (SELECT event_id AS id1, ts AS ts1, value AS v1
                    FROM events WHERE event_id % 101 = 0),
           b AS (SELECT event_id AS id2, ts AS ts2, value AS v2
                 FROM events WHERE event_id % 103 = 0)
         SELECT id1, id2, v1 - v2 AS v_gap
         FROM a JOIN b ON ts1 < ts2 AND v1 > v2
         ORDER BY id1, id2""",
    "q22_tumbling_window" ->
      """SELECT strftime(make_timestamp(CAST(floor(epoch(ts)/3600)*3600*1000000 AS BIGINT)),
           '%Y-%m-%d %H:%M:%S') AS w_start,
         event_type, CAST(count(*) AS BIGINT) AS n_events,
         round(sum(value),2) AS sum_value
         FROM events GROUP BY 1,2 ORDER BY 1,2""",
    "q27_proctime_global" ->
      """SELECT strftime(make_timestamp(
           CAST(floor(epoch(ts + INTERVAL 2 SECOND)/3600)*3600*1000000 AS BIGINT)),
           '%Y-%m-%d %H:%M:%S') AS w_start,
         event_type, CAST(count(*) AS BIGINT) AS n_events
         FROM events GROUP BY 1,2 ORDER BY 1,2""",
    "q23_hopping_window" ->
      """SELECT strftime(make_timestamp(CAST((CAST(floor(epoch(ts)/1800) AS BIGINT) - k)*1800*1000000 AS BIGINT)),
           '%Y-%m-%d %H:%M:%S') AS w_start,
         CAST(count(*) AS BIGINT) AS n_events,
         round(sum(value),2) AS sum_value
         FROM events CROSS JOIN (SELECT unnest([0,1]) AS k) ks
         GROUP BY 1 ORDER BY 1""",
    "q24_session_window" ->
      """WITH marked AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 6 HOUR THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         sessions AS (
           SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sid
           FROM marked)
         SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value),2) AS sum_value
         FROM sessions GROUP BY user_id, sid ORDER BY user_id, s_start""",
    "q25_ysb_campaign" ->
      """SELECT strftime(make_timestamp(CAST(floor(epoch(ts)/86400)*86400*1000000 AS BIGINT)),
           '%Y-%m-%d %H:%M:%S') AS w_start,
         c_mktsegment, CAST(count(*) AS BIGINT) AS n_views
         FROM events JOIN customer ON user_id = c_custkey
         WHERE event_type = 'view'
         GROUP BY 1,2 ORDER BY 1,2""",
    "q26_json_extract" ->
      """SELECT event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         event_type
         FROM events WHERE event_id % 97 = 0 ORDER BY event_id""",
    "q59_rows_window" ->
      """WITH t AS (
           SELECT user_id, value,
             (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) // 20 AS win
           FROM events)
         SELECT user_id, CAST(win AS BIGINT) AS win,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS sum_value
         FROM t GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
