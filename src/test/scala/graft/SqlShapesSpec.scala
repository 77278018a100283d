package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, SqlShapes}
import graft.functions.GraftFunctions
import graft.sources.FileSources

class SqlShapesSpec extends SparkSpec {

  test("approx_count_distinct is within 5% of exact") {
    val rows = SqlShapes.defs("q45_approx_distinct")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)} orders estimate off by >5%")
      assert(r.getBoolean(4), s"${r.getString(0)} parts estimate off by >5%")
    }
  }

  test("SQL-registered functions match the Column API expressions") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Tables(spark, sfDir, "documents")
      .withColumn("toks", split($"text", "\\s+"))
      .createOrReplaceTempView("docs_fn_test")
    val viaSql = spark.sql(
      """SELECT doc_id, simhash64(toks) AS sh, minhash_sig(toks, 8, 1) AS mh,
         winnow_fingerprints(toks, 4) AS fp FROM docs_fn_test""")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](2), r.getSeq[Long](3))).toSeq
    val viaApi = Tables(spark, sfDir, "documents")
      .withColumn("toks", split($"text", "\\s+"))
      .select($"doc_id",
        graft.functions.TextHashes.simhash64($"toks").as("sh"),
        graft.functions.TextHashes.minhashSig($"toks", 8, 1).as("mh"),
        graft.functions.TextHashes.winnowFingerprints($"toks", 4).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](2), r.getSeq[Long](3))).toSeq
    assert(viaSql.toSet == viaApi.toSet)
    // non-literal k must fail clearly
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_sig(toks, doc_id + 1, 1) FROM docs_fn_test").collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"), err.getMessage)
  }

  test("CSV and JSON round-trip lineitem with explicit schemas") {
    val li = Tables(spark, sfDir, "lineitem")
    val tmp = java.nio.file.Files.createTempDirectory("graft_files").toString
    FileSources.writeCsv(li, s"$tmp/csv")
    FileSources.writeJsonLines(li, s"$tmp/json")
    val backCsv = FileSources.readCsv(spark, s"$tmp/csv", li.schema)
    val backJson = FileSources.readJsonLines(spark, s"$tmp/json", li.schema)
    assert(backCsv.schema == li.schema)
    assert(backJson.schema == li.schema)
    val orig = li.collect().toSet
    assert(backCsv.collect().toSet == orig, "csv round-trip")
    assert(backJson.collect().toSet == orig, "json round-trip")
  }

  test("partitioned parquet sink prunes partitions on read") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = operators.NexmarkQueries.q10(spark)
    FileSources.writePartitioned(df, s"$tmp/bids", Seq("p_date", "p_hour"))
    val back = spark.read.parquet(s"$tmp/bids").filter($"p_hour" === 0)
    assert(back.count() > 0)
    val plan = back.queryExecution.executedPlan.toString
    assert(back.inputFiles.forall(_.contains("p_hour=0")),
      "partition pruning must restrict input files")
  }

  test("multimodal: decode, features, frames are consistent") {
    val assets = Multimodal.assets(spark, 500)
    val meta = Multimodal.decodeMeta(assets)
    assert(meta.count() == 500, "all synthetic assets must decode")
    val feats = Multimodal.extractFeatures(assets, 32)
    assert(feats.collect().forall(_.feature.length == 32))
    val frames = Multimodal.sampleFrames(meta, 10)
    import spark.implicits._
    val audioVideo = meta.filter($"n_frames" > 1).count()
    assert(frames.select("asset_id").distinct().count() == audioVideo)
    // resize rewrites header only
    val resized = Multimodal.decodeMeta(Multimodal.resize(assets, 128, 128))
    assert(resized.collect().forall(m => m.width == 128 && m.height == 128))
    val origLens = meta.collect().map(m => m.asset_id -> m.payload_len).toMap
    assert(resized.collect().forall(m => m.payload_len == origLens(m.asset_id)),
      "resize stub must preserve payload")
  }

  test("mm_phash_dedup: every corrupted re-crawl pairs with its original") {
    import spark.implicits._
    val pairs = Multimodal.defs("mm_phash_dedup")(spark, sfDir)
      .select($"id1", $"id2", $"hamming").as[(Long, Long, Long)].collect()
    // of the 200 planted near-dups (id, id+100000), the banded-LSH +
    // Hamming-verify recovers the vast majority (a pair whose flips touch
    // all 4 bands can legitimately miss — that's the LSH contract)
    val planted = (0L until 2000L by 10L).map(id => id -> (id + 100000L)).toSet
    val found = pairs.map(p => (p._1, p._2)).toSet
    assert(found.subsetOf(planted), "false positives among random assets")
    assert(found.size >= 150, s"recovered only ${found.size} of 200 planted")
    assert(pairs.forall(p => p._3 <= 8 && p._3 >= 0))
    // corruption must actually flip bits for most recovered pairs (else
    // the test degenerates into exact dedup)
    assert(pairs.count(_._3 > 0) > 100,
      "perturbation did not move the fingerprints")
  }

  test("q96: histogram quantiles bracket the exact percentiles per tier") {
    import spark.implicits._
    val out = SqlShapes.defs("q96_hist_quantiles")(spark, sfDir)
      .select($"l_returnflag", $"n_rows", $"p50_est", $"p95_est", $"p99_est")
      .as[(String, Long, Double, Double, Double)].collect()
    val li = Tables(spark, sfDir, "lineitem")
    assert(out.find(_._1 == "ALL").get._2 == li.count())
    assert(out.filter(_._1 != "ALL").map(_._2).sum == li.count())
    // estimate = lower bound of the containing quarter-octave bin:
    // est <= exact percentile < est * 2^0.25 (on the cents grid)
    val exact = li.groupBy($"l_returnflag")
      .agg(expr("percentile(CAST(floor(l_extendedprice * 100 + 0.5001) AS BIGINT), 0.5)").as("p50"),
        expr("percentile(CAST(floor(l_extendedprice * 100 + 0.5001) AS BIGINT), 0.95)").as("p95"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // estimates are bin lower bounds; exact percentiles interpolate and
    // may straddle a bin edge — allow one quarter-octave of slack each way
    out.filter(_._1 != "ALL").foreach { case (g, _, p50, p95, p99) =>
      val (e50, e95) = exact(g)
      assert(p50 * 100 * 0.84 <= e50 && e50 < p50 * 100 * 1.42,
        s"$g p50 $p50 vs $e50")
      assert(p95 * 100 * 0.84 <= e95 && e95 < p95 * 100 * 1.42,
        s"$g p95 $p95 vs $e95")
      assert(p99 >= p95 && p95 >= p50, "quantile monotonicity")
    }
  }

  test("q121: delta-merged aggregates equal the full recompute everywhere") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = operators.SqlShapes.defs("q121_incremental_agg")(spark, sfDir).cache()
    // the self-check column must be TRUE for every group
    assert(out.filter(!col("refresh_ok")).count() == 0)
    // merged counts partition the events table
    val n = out.agg(sum($"n")).head.getLong(0)
    assert(n == Tables(spark, sfDir, "events").count())
    // merged sum equals the straight integer-cents sum
    val s2 = Tables(spark, sfDir, "events")
      .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))).head.getLong(0)
    assert(out.agg(sum($"sum_c")).head.getLong(0) == s2)
  }

  test("q122: audit checks cover the contract and a healthy corpus is clean") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = operators.SqlShapes.defs("q122_dq_audit")(spark, sfDir)
      .as[(String, Long)].collect().toMap
    assert(out.size == 6)
    // the driver corpus satisfies all referential + domain constraints
    assert(out.values.forall(_ == 0L), s"violations: $out")
    // and the audit actually reacts: a poisoned orphan row must be counted
    val li = Tables(spark, sfDir, "lineitem")
    val poisoned = li.limit(1).withColumn("l_orderkey", lit(-999L))
      .unionByName(li)
    val orphans = poisoned.join(
      Tables(spark, sfDir, "orders").select($"o_orderkey"),
      poisoned("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(orphans == 1L, "audit must detect the injected orphan")
  }

  test("q124: unpivot round-trips back to the wide aggregates") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val long = operators.SqlShapes.defs("q124_unpivot")(spark, sfDir).cache()
    // melt produces exactly |groups| x |metrics| rows
    val flags = long.select($"l_returnflag").distinct().count()
    assert(long.count() == flags * 3)
    // re-pivoting restores one row per flag with the original values
    val wide = long.groupBy($"l_returnflag").pivot("metric").agg(first($"value"))
    val cents = Tables(spark, sfDir, "lineitem")
      .agg(sum(expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")))
      .head.getLong(0)
    assert(wide.agg(sum($"sum_cents")).head.getLong(0) == cents)
    assert(wide.agg(sum($"n_rows")).head.getLong(0) ==
      Tables(spark, sfDir, "lineitem").count())
  }

  test("q128: Pareto marks equal brute force and are monotone") {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events")
      .select($"user_id".as[Long]).collect()
    val counts = ev.groupBy(identity).map { case (u, xs) => (u, xs.length.toLong) }
      .toSeq.sortBy { case (u, c) => (-c, u) }
    val total = counts.map(_._2).sum
    val cums = counts.scanLeft(0L)(_ + _._2).tail
    def mark(p: Int) = (cums.indexWhere(_ * 100 >= total * p) + 1).toLong
    val got = operators.SqlShapes.defs("q128_pareto")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(got == ((total, counts.length.toLong, mark(50), mark(80), mark(95),
      counts.head._2 * 1000 / total)))
    assert(got._3 <= got._4 && got._4 <= got._5 && got._5 <= got._2)
  }

  test("q129: malformed rows are exactly the injected set, k sums check out") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = operators.SqlShapes.defs("q129_json_errors")(spark, sfDir).cache()
    val ev = Tables(spark, sfDir, "events")
    // truncating {"k": N} is always invalid -> every injected row counts
    assert(out.agg(sum($"n_malformed")).head.getLong(0) ==
      ev.filter($"event_id" % 7 === 0).count())
    assert(out.agg(sum($"n_rows")).head.getLong(0) == ev.count())
    // surviving k values equal a direct parse of the untouched rows
    val expectK = ev.filter($"event_id" % 7 =!= 0)
      .select(expr("from_json(props, 'k BIGINT').k").as("k"))
      .agg(sum($"k")).head.getLong(0)
    assert(out.agg(sum($"sum_k")).head.getLong(0) == expectK)
  }
}
