package graft

import graft.operators.Relational
import org.apache.spark.sql.functions.{to_date, unix_micros, unix_millis}

/** Smoke + invariant tests for the relational catalog at sf0.001.
  * Full value-level verification is the driver's DuckDB gate; here we
  * assert structural invariants cheaply so `sbt test` stays fast.
  */
class RelationalSpec extends SparkSpec {

  test("every relational query runs and yields a stable schema") {
    Relational.defs.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val rows = df.count()
      assert(rows >= 0, s"$name failed to execute")
      assert(df.columns.nonEmpty, s"$name has empty schema")
      assert(df.columns.distinct.length == df.columns.length,
        s"$name has duplicate column names")
    }
  }

  test("every query has an oracle or is explicitly rows-only") {
    val missing = Relational.defs.keySet -- Relational.oracles.keySet
    assert(missing.isEmpty, s"relational queries missing oracles: $missing")
  }

  test("q01 aggregates are conserved") {
    import org.apache.spark.sql.functions._
    val li = Tables(spark, sfDir, "lineitem")
    val total = li.filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp")).count()
    val agg = Relational.defs("q01_pricing_summary")(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("count_order")).head.getLong(0)
    assert(agg == total, "q01 group counts must sum to table size")
  }

  test("q08 semi + q09 anti partition the customer set") {
    import org.apache.spark.sql.functions._
    val c = Tables(spark, sfDir, "customer")
    val bigOrders = Tables(spark, sfDir, "orders").filter(col("o_totalprice") > 300000)
    val semi = c.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = Relational.defs("q09_anti_join")(spark, sfDir).count()
    assert(semi + anti == c.count())
  }

  test("q12 top-k is ordered descending") {
    val prices = Relational.defs("q12_sort_limit")(spark, sfDir)
      .collect().map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q108 funnel equals a brute-force per-user chain DP") {
    import spark.implicits._
    val got = operators.Windows.defs("q108_funnel")(spark, sfDir)
      .as[(String, Long)].collect().toMap
    val ev = Tables(spark, sfDir, "events")
      .select($"user_id", $"ts", $"event_type")
      .as[(Long, java.sql.Timestamp, String)].collect()
    val steps = Seq("view", "click", "purchase")
    val hour = 3_600_000L
    // per user: depth-k reachable iff some type-k event follows a
    // reachable depth-(k-1) event by (0, 1h] — track ALL reachable ends
    val depth = ev.groupBy(_._1).view.mapValues { rows =>
      var ends: Seq[Set[Long]] = Seq(
        rows.filter(_._3 == steps.head).map(_._2.getTime).toSet)
      for (k <- 1 until steps.length) {
        val nxt = rows.filter(_._3 == steps(k)).map(_._2.getTime)
          .filter(t => ends(k - 1).exists(p => t > p && t <= p + hour))
        ends = ends :+ nxt.toSet
      }
      ends.lastIndexWhere(_.nonEmpty) + 1
    }.toMap
    val expect = Map(
      "1_view" -> depth.values.count(_ >= 1).toLong,
      "2_view_click" -> depth.values.count(_ >= 2).toLong,
      "3_view_click_purchase" -> depth.values.count(_ >= 3).toLong)
    assert(got == expect, s"got=$got expect=$expect")
    assert(got("1_view") >= got("2_view_click") &&
      got("2_view_click") >= got("3_view_click_purchase"))
  }

  test("q113 retention matrix equals brute force; d0 counts the cohort") {
    import spark.implicits._
    val ud = Tables(spark, sfDir, "events")
      .select($"user_id", to_date($"ts").cast("string"))
      .as[(Long, String)].collect().distinct
    val cohort = ud.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    def off(u: Long, day: String) =
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(cohort(u)), java.time.LocalDate.parse(day))
    val expected = ud.map(_._1).distinct.groupBy(cohort).map { case (c, us) =>
      def ret(k: Long) = us.count(u =>
        ud.exists(p => p._1 == u && off(u, p._2) == k)).toLong
      (c, us.length.toLong, ret(0), ret(1), ret(2), ret(3), ret(7))
    }.toSeq.sortBy(_._1)
    val got = operators.Windows.defs("q113_cohort_retention")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // day-0 retention IS the cohort size; later offsets can only shrink
    got.foreach { case (_, n, d0, d1, d2, d3, d7) =>
      assert(d0 == n)
      Seq(d1, d2, d3, d7).foreach(x => assert(x <= n))
    }
  }

  test("q114 gap histogram equals brute force and reconciles with the spine") {
    import spark.implicits._
    val ud = Tables(spark, sfDir, "events")
      .select($"user_id", to_date($"ts").cast("string"))
      .as[(Long, String)].collect().distinct
    def epoch(s: String) = java.time.LocalDate.parse(s).toEpochDay
    val gaps = ud.groupBy(_._1).values.flatMap { rows =>
      val ds = rows.map(r => epoch(r._2)).sorted
      ds.zip(ds.tail).map { case (a, b) => (rows.head._1, b - a - 1) }
        .filter(_._2 >= 1)
    }.toSeq
    val expectedHist = gaps.groupBy(_._2).map { case (len, xs) =>
      (len, xs.size.toLong, xs.map(_._1).distinct.size.toLong)
    }.toSeq.sortBy(_._1)
    val got = operators.Windows.defs("q114_gap_fill")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    val (totalRow, hist) = got.partition(_._1 == 0L)
    assert(hist == expectedHist)
    // the spine-derived inactive-day total must equal sum(len * n_gaps)
    assert(totalRow.head._2 == hist.map(r => r._1 * r._2).sum)
    assert(totalRow.head._3 == gaps.map(_._1).distinct.size.toLong)
  }

  test("q115 session stats equal a brute-force 30-minute sessionizer") {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
      .select($"user_id", unix_millis($"ts"))
      .as[(Long, Long)].collect()
    val gap = 30L * 60 * 1000
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val ms = rows.map(_._2).sorted
      val bounds = ms.indices.filter(i => i == 0 || ms(i) - ms(i - 1) > gap)
      (bounds :+ ms.length).sliding(2).map { case Seq(a, b) =>
        (rows.head._1, (b - a).toLong, (ms(b - 1) - ms(a)) / 1000)
      }.toSeq
    }.toSeq
    val row = operators.Windows.defs("q115_session_stats")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    val nSess = sessions.size.toLong
    val nEv = sessions.map(_._2).sum
    assert(row == ((sessions.map(_._1).distinct.size.toLong, nSess, nEv,
      nEv / nSess, sessions.map(_._3).sum / nSess,
      sessions.map(_._2).max, sessions.map(_._3).max)))
    assert(nEv == ev.length.toLong, "sessions must partition the events")
  }

  test("q116 transitions equal brute force; rows sum to their totals") {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
      .select($"user_id", unix_micros($"ts"), $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val pairs = ev.groupBy(_._1).values.flatMap { rows =>
      val ordered = rows.sortBy(r => (r._2, r._3)).map(_._4)
      ordered.zip(ordered.tail)
    }.toSeq
    val counts = pairs.groupBy(identity).map { case ((f, t), xs) =>
      (f, t, xs.size.toLong) }
    val totals = counts.groupBy(_._1).map { case (f, xs) => (f, xs.map(_._3).sum) }
    val expected = counts.map { case (f, t, n) =>
      (f, t, n, n * 1000 / totals(f)) }.toSeq.sortBy(r => (r._1, r._2))
    val got = operators.Windows.defs("q116_transition_matrix")(spark, sfDir)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == expected)
    // transitions per user = events - 1, summed over users with >= 1 event
    val nUsers = ev.map(_._1).distinct.length
    assert(got.map(_._3).sum == ev.length.toLong - nUsers)
  }

  test("q118 deciles are balanced, ordered, and cover each language") {
    import spark.implicits._
    val got = operators.Windows.defs("q118_analytic_extras")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Double, Double, Long)]
      .collect().toSeq
    val total = Tables(spark, sfDir, "documents").count()
    assert(got.map(_._3).sum == total, "deciles must partition the corpus")
    got.groupBy(_._1).values.foreach { rows =>
      val sizes = rows.sortBy(_._2).map(_._3)
      // ntile balance: any two buckets differ by at most one row
      assert(sizes.max - sizes.min <= 1, s"unbalanced: $sizes")
      // ranges are non-decreasing across deciles
      val ordered = rows.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Seq(a, b) => assert(a._5 <= b._4 || a._5 <= b._5)
        case _ =>
      }
      // the partition-first doc id is one constant per language
      assert(ordered.map(_._8).distinct.size == 1)
      // cume_dist tops out at exactly 1.0 in the last decile
      assert(ordered.last._7 == 1.0)
    }
  }

  test("q123 burst equals brute-force trailing-window max per user") {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
      .select($"user_id", unix_millis($"ts"))
      .as[(Long, Long)].collect()
    val expected = ev.groupBy(_._1).map { case (u, rows) =>
      val ms = rows.map(_._2).sorted
      val bursts = ms.map(t => (ms.count(x => x > t - 3600000L && x <= t), t))
      val mx = bursts.map(_._1).max
      (u, ms.length.toLong, mx.toLong, bursts.filter(_._1 == mx).map(_._2).min)
    }.toSeq.sortBy(_._1)
    val got = operators.Windows.defs("q123_burst_detection")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // burst can never exceed the user's event count and is at least 1
    got.foreach { case (_, n, b, _) => assert(b >= 1 && b <= n) }
  }
}
