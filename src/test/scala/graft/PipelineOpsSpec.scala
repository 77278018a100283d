package graft

import org.apache.spark.sql.functions._
import graft.operators.{PipelineOps, TextOps}

/** Value-level checks for the corpus-production operators (PipelineOps):
  * the CC clustering gets a brute-force transitive-closure cross-check,
  * the rest sanity-check invariants the DuckDB oracle can't express
  * (e.g. clusters partition the pair graph, decontamination is monotone).
  */
class PipelineOpsSpec extends SparkSpec {

  private def run(name: String) =
    PipelineOps.defs(name)(spark, sfDir)

  test("q81: cluster labels equal brute-force transitive closure of the pairs") {
    import spark.implicits._
    val pairs = TextOps.md5LshScoredPairs(spark, sfDir)
      .select($"id1", $"id2").as[(Long, Long)].collect()
    // brute-force union-find on the driver
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.foreach { case (a, b) => union(a, b) }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = nodes.groupBy(find).map { case (rep, members) =>
      (rep, members.length.toLong)
    }.toSeq.sortBy(_._1)
    val got = run("q81_dup_clusters")
      .select($"rep_id", $"n_docs").as[(Long, Long)].collect().toSeq
    assert(got == expected)
    // clusters partition the node set
    assert(got.map(_._2).sum == nodes.length.toLong)
  }

  test("ccLabels matches union-find on random graphs (property)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // deterministic random graphs: n nodes, m edges, varying density —
    // path-like sparse graphs maximize propagation depth, dense ones
    // maximize merge fan-in
    val cases = for {
      trial <- 0 until 8
    } yield {
      val n = 3 + trial * 4
      val m = 1 + trial * 6
      val gen = Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
      gen(org.scalacheck.Gen.Parameters.default, Seed(42L + trial)).get
        .filter { case (a, b) => a != b }
    }
    cases.filter(_.nonEmpty).foreach { pairs =>
      {
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        val expected = nodes.map(v => (v, find(v))).toMap
        val sym = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
        val got = PipelineOps.ccLabels(spark, sym.toDF("src", "dst"))
          .as[(Long, Long)].collect().toMap
        assert(got == expected, s"edges=$pairs")
      }
    }
  }

  test("ccLabels collapses a 200-node path (needs pointer jumping under the round cap)") {
    import spark.implicits._
    val n = 200L
    // a path 0-1-2-...-199: diameter 199. Pure neighbor-min propagates
    // the min ONE hop per round and would need 199 rounds (the 50-round
    // cap would leave wrong labels); pointer jumping doubles the chase
    // distance per round, so this converges comfortably under the cap.
    val edges = (0L until n - 1).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val got = operators.PipelineOps.ccLabels(spark, edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got.size == n.toInt)
    assert(got.values.forall(_ == 0L), "every node must reach the component min")
  }

  test("q92: mix selection is capped by targets and reconciles with q87") {
    import spark.implicits._
    val out = run("q92_mix_sample").cache()
    val targets = run("q87_temperature_mix")
      .select($"lang", $"target_docs").as[(String, Long)].collect().toMap
    val avail = Tables(spark, sfDir, "documents")
      .groupBy(col("lang")).count().as[(String, Long)].collect().toMap
    out.select($"lang", $"target_docs", $"n_selected")
      .as[(String, Long, Long)].collect().foreach { case (lang, tgt, sel) =>
        assert(tgt == targets(lang), s"$lang target mismatch")
        assert(sel == math.min(tgt, avail(lang)), s"$lang selection not capped")
      }
  }

  test("q82: eval docs are excluded and counts are consistent") {
    import spark.implicits._
    val out = run("q82_decontaminate").cache()
    val perLang = out.select($"n_train", $"n_contaminated" + $"n_clean")
      .as[(Long, Long)].collect()
    perLang.foreach { case (total, split) => assert(total == split) }
    val nTrain = out.agg(sum($"n_train")).head.getLong(0)
    val expectedTrain = Tables(spark, sfDir, "documents")
      .filter(col("doc_id") % 97 =!= 0).count()
    assert(nTrain == expectedTrain)
  }

  test("q83: failure counts bound the keep count") {
    import spark.implicits._
    run("q83_gopher_rules").collect().foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val keep = r.getAs[Long]("n_keep")
      val fails = Seq("f_ntok", "f_meanlen", "f_alpha", "f_stop", "f_repeat")
        .map(r.getAs[Long](_))
      assert(keep <= n)
      // every non-kept doc fails at least one rule
      assert(n - keep <= fails.sum)
      // no single rule fails more docs than were dropped... (not true in
      // general) — but each failure count is bounded by n
      fails.foreach(f => assert(f <= n))
    }
  }

  test("q84: exactly top-5 per language, scores non-increasing, ranks 1..5") {
    import spark.implicits._
    val out = run("q84_tfidf_topk")
      .select($"lang", $"score", $"rank").as[(String, Long, Long)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1L to byRank.length).toSeq)
      assert(byRank.length <= 5)
      // scores are non-increasing in rank
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a._2 >= b._2)
        case _ =>
      }
    }
  }

  test("q86: dedup accounting reconciles with q81's clusters") {
    import spark.implicits._
    val out = run("q86_dedup_pipeline").cache()
    // fuzzy-removed across languages = sum over clusters of (size - 1)
    val removed = out.agg(sum($"n_fuzzy_removed")).head.getLong(0)
    val fromClusters = run("q81_dup_clusters")
      .agg(sum($"n_removed")).head.getLong(0)
    assert(removed == fromClusters)
    // kept + removed <= corpus slice (quality drops account for the rest)
    val nIn = out.agg(sum($"n_in")).head.getLong(0)
    val kept = out.agg(sum($"n_kept")).head.getLong(0)
    assert(kept + removed <= nIn)
    assert(nIn == Tables(spark, sfDir, "documents")
      .filter(col("doc_id") % 5 === 0).count())
  }

  test("q88: incremental dedup agrees with the pairwise path") {
    import spark.implicits._
    // a new doc is dup-vs-index iff the SELF-join pair list (q61 path)
    // contains a pair linking it to an index doc — independent derivation
    val pairs = TextOps.md5LshScoredPairs(spark, sfDir)
      .select($"id1", $"id2").as[(Long, Long)].collect()
    val expectedDupNew = pairs.flatMap { case (a, b) =>
      Seq((a, b), (b, a))
    }.collect { case (nw, idx) if nw % 10 != 0 && idx % 10 == 0 => nw }.toSet
    val out = run("q88_incremental_dedup").cache()
    val nDup = out.agg(sum($"n_dup_vs_index")).head.getLong(0)
    assert(nDup == expectedDupNew.size.toLong)
    val (nNew, nNovel) = out.agg(sum($"n_new"), sum($"n_novel"))
      .as[(Long, Long)].head()
    assert(nNew == nNovel + nDup)
  }

  test("q87: temperature weights flatten the distribution, shares bounded") {
    import spark.implicits._
    val rows = run("q87_temperature_mix")
      .select($"n_docs", $"w_q", $"share_ppm")
      .as[(Long, Long, Long)].collect()
    // weights are monotone in n_docs and sub-linear (sqrt): the doc-count
    // ratio always exceeds the weight ratio for the larger language
    val sorted = rows.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((n1, w1, _), (n2, w2, _)) if n1 < n2 =>
        assert(w1 <= w2)
        assert(w2.toDouble / w1 <= n2.toDouble / n1 + 1e-9)
      case _ =>
    }
    // shares are parts-per-million of the mix, summing to at most 1e6
    val tot = rows.map(_._3).sum
    assert(tot <= 1000000L && tot > 1000000L - rows.length)
  }

  test("q89: chunk accounting reconciles with the token totals") {
    import spark.implicits._
    val out = run("q89_chunk_dedup").cache()
    val docs = Tables(spark, sfDir, "documents")
      .withColumn("n_tok", size(split(col("text"), "\\s+")))
    // chunk count = sum over docs of ceil(n_tok/16)
    val expectChunks = docs
      .agg(sum(expr("(n_tok + 15) div 16"))).head.getLong(0)
    assert(out.agg(sum($"n_chunks")).head.getLong(0) == expectChunks)
    // kept tokens + tokens inside dup chunks = corpus tokens
    val totTok = docs.agg(sum($"n_tok")).head.getLong(0)
    val kept = out.agg(sum($"n_tokens_kept")).head.getLong(0)
    assert(kept <= totTok)
    // a chunk marked dup occurs in >=2 docs: removing dups from BOTH
    // sides means dup chunk count is even or spans docs — weaker exact
    // check: doc coverage equals corpus doc count
    assert(out.agg(sum($"n_docs")).head.getLong(0) == docs.count())
  }

  test("q90: PQ-ADC is exact for codebook vectors and self-consistent") {
    import spark.implicits._
    val out = operators.VectorOps.defs("q90_pq_ann")(spark, sfDir).cache()
    // ranks are 1..5 per query, adc non-decreasing in rank
    out.select($"query_id", $"adc", $"rank").as[(Long, Long, Long)]
      .collect().groupBy(_._1).foreach { case (_, rows) =>
        val byRank = rows.sortBy(_._3)
        assert(byRank.map(_._3).toSeq == (1L to byRank.length).toSeq)
        byRank.sliding(2).foreach {
          case Array(a, b) => assert(a._2 <= b._2)
          case _ =>
        }
      }
    // query 0 is itself a codebook vector (vec_id 0 < 16): its own
    // subvectors quantize to themselves (distance 0 beats every other
    // code; ties break to the lower code = itself), so some OTHER vector
    // assigned the same codes could reach adc 0, but no adc is negative
    out.select(min($"adc")).as[Long].collect().foreach(m => assert(m >= 0L))
  }

  test("q91: repetition flags bounded and max-unigram consistent") {
    import spark.implicits._
    val out = run("q91_repetition_signals").cache()
    out.collect().foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n_flag_uni") <= n)
      assert(r.getAs[Long]("n_flag_big") <= n)
      val any = r.getAs[Long]("n_flag_any")
      assert(any <= n)
      assert(any >= math.max(r.getAs[Long]("n_flag_uni"), r.getAs[Long]("n_flag_big")))
      assert(r.getAs[Long]("worst_uni") >= 1L)
    }
    // independent recomputation of one doc's max unigram count
    val doc0 = Tables(spark, sfDir, "documents")
      .filter(col("doc_id") === 0).select(col("text")).as[String].head()
    val toks = doc0.split("\\s+")
    val expectedMax = toks.groupBy(identity).values.map(_.length).max.toLong
    val src0 = Tables(spark, sfDir, "documents")
      .filter(col("doc_id") === 0).select(col("source")).as[String].head()
    val worst = out.filter($"source" === src0).select($"worst_uni").as[Long].head()
    assert(worst >= expectedMax)
  }

  test("q85: per-centroid counts match q72's assignment and sums are exact") {
    import spark.implicits._
    val upd = run("q85_kmeans_update").cache()
    val q72 = operators.VectorOps.defs("q72_kmeans_assign")(spark, sfDir)
    val nUpd = upd.select($"cid", $"n_vecs").as[(Long, Long)].collect().toMap
    val n72 = q72.select($"cid", $"n_vecs").as[(Long, Long)].collect().toMap
    assert(nUpd == n72)
    // total mass: sum of per-centroid counts = corpus size
    assert(nUpd.values.sum == Tables(spark, sfDir, "embeddings").count())
    // l1 >= |sum_d1| for every centroid (dim-1 contribution is included)
    upd.select($"l1", abs($"sum_d1")).as[(Long, Long)].collect()
      .foreach { case (l1, s1) => assert(l1 >= s1) }
  }

  test("q94: bloom has no false negatives and probe accounting is total") {
    import spark.implicits._
    val out = run("q94_bloom_dedup")
      .select($"lang", $"n_new", $"n_flagged", $"n_exact")
      .as[(String, Long, Long, Long)].collect()
    // no false negatives: every exact member is bloom-flagged
    out.foreach { case (_, n, f, e) => assert(f >= e && f <= n) }
    val nProbe = Tables(spark, sfDir, "documents")
      .filter(col("doc_id") % 5 === 0).count()
    assert(out.map(_._2).sum == nProbe)
  }

  test("q99: report tiers reconcile — ALL row equals the per-language sums") {
    import spark.implicits._
    val rep = run("q99_corpus_report")
      .select($"lang", $"n_docs", $"n_dup_copies", $"n_quality_fail", $"n_tokens")
      .as[(String, Long, Long, Long, Long)].collect()
    val all = rep.find(_._1 == "ALL").get
    val per = rep.filter(_._1 != "ALL")
    assert(per.map(_._2).sum == all._2 && per.map(_._3).sum == all._3 &&
      per.map(_._4).sum == all._4 && per.map(_._5).sum == all._5)
    assert(all._2 == Tables(spark, sfDir, "documents").count())
    assert(all._3 >= 0 && all._4 >= 0 && all._5 > all._2) // >1 token/doc
  }

  test("q100: CMS estimates never undercount and match brute-force exact counts") {
    import spark.implicits._
    val out = run("q100_cms_topk")
      .select($"tok", $"n_exact", $"n_est", $"overcount")
      .as[(String, Long, Long, Long)].collect()
    assert(out.length == 20)
    // CMS guarantee: min over rows of hashed cells >= true count
    out.foreach { case (t, ex, est, over) =>
      assert(est >= ex, s"CMS undercounted '$t'")
      assert(over == est - ex)
    }
    // exact side equals a brute-force recount
    val brute = Tables(spark, sfDir, "documents")
      .select(explode(split($"text", "\\s+")).as("tok"))
      .groupBy($"tok").count()
      .as[(String, Long)].collect().toMap
    out.foreach { case (t, ex, _, _) => assert(brute(t) == ex) }
    // top-20 really are the 20 largest (count, then token) keys
    val expectTop = brute.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    assert(out.map(r => (r._1, r._2)).toSeq ==
      expectTop.sortBy { case (t, c) => (-c, t) })
  }

  test("q101: overlap matrix bounds and brute-force pair recount") {
    import spark.implicits._
    val out = run("q101_source_overlap")
      .select($"source1", $"source2", $"n_shared", $"n1", $"n2",
        $"jaccard_permille")
      .as[(String, String, Long, Long, Long, Long)].collect()
    out.foreach { case (s1, s2, sh, n1, n2, jp) =>
      assert(s1 < s2) // each unordered pair reported once
      assert(sh >= 1 && sh <= math.min(n1, n2))
      assert(jp >= 0 && jp <= 1000)
      assert(jp == 1000 * sh / (n1 + n2 - sh))
    }
    // brute-force one pair via the same fingerprint
    out.headOption.foreach { case (s1, s2, sh, _, _, _) =>
      val fp = Tables(spark, sfDir, "documents")
        .select(md5(array_join(slice(split($"text", "\\s+"), 1, 16), " "))
          .as("h"), $"source")
        .distinct().as[(String, String)].collect()
      val a = fp.filter(_._2 == s1).map(_._1).toSet
      val b = fp.filter(_._2 == s2).map(_._1).toSet
      assert((a & b).size.toLong == sh)
    }
  }

  test("q102: score buckets partition the corpus and bound their members") {
    import spark.implicits._
    val out = run("q102_quality_lr")
      .select($"bucket", $"n_docs", $"z_min_5", $"z_max_5")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._2).sum == Tables(spark, sfDir, "documents").count())
    out.foreach { case (b, n, lo, hi) =>
      assert(n > 0 && lo <= hi)
      // bucket = floor(z*8)  =>  z*1e5 ∈ [b*12500, (b+1)*12500)
      assert(lo >= b * 12500 && hi < (b + 1) * 12500)
    }
  }

  test("q103: packing report conserves documents and bounds fill rate") {
    import spark.implicits._
    val out = run("q103_pack_efficiency")
      .select($"padded", $"n_docs", $"sum_kept", $"sum_truncated",
        $"fill_permille")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.map(_._2).sum == Tables(spark, sfDir, "documents").count())
    out.foreach { case (p, n, kept, trunc, fill) =>
      assert(p % 512 == 0 && p > 0 && p <= 4096)
      assert(kept <= p * n) // padding is non-negative
      assert(trunc >= 0)
      assert(fill == 1000 * kept / (p * n) && fill <= 1000)
      // pad-to-next-512: every doc fills more than the previous boundary
      assert(kept > (p - 512) * n)
    }
  }

  test("q104: merge actions partition the key union and match a brute-force merge") {
    import spark.implicits._
    val rows = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val index = rows.filter(_._1 % 5 != 0).toMap
    val batch = rows.filter(_._1 % 3 == 0)
      .map { case (id, t) => id -> (if (id % 2 == 0) t + " v2" else t) }.toMap
    val keys = index.keySet ++ batch.keySet
    val expect = keys.groupBy { id =>
      (index.get(id), batch.get(id)) match {
        case (None, _) => "insert"
        case (_, None) => "keep"
        case (Some(a), Some(b)) if a != b => "update"
        case _ => "noop"
      }
    }.map { case (a, ids) =>
      a -> (ids.size.toLong,
        ids.toSeq.map(id => batch.getOrElse(id, index(id)).length.toLong).sum)
    }
    val got = run("q104_snapshot_merge")
      .select($"action", $"n_docs", $"sum_chars")
      .as[(String, Long, Long)].collect()
      .map { case (a, n, c) => a -> (n, c) }.toMap
    assert(got == expect)
    assert(got.values.map(_._1).sum == keys.size.toLong)
  }

  test("q106: cluster-keyed split never straddles and counts reconcile") {
    import spark.implicits._
    val out = run("q106_cluster_split")
      .select($"split", $"n_docs", $"n_clusters", $"n_multi_docs")
      .as[(String, Long, Long, Long)].collect()
    val slice = Tables(spark, sfDir, "documents")
      .filter($"doc_id" % 5 === 0).select($"doc_id")
      .as[Long].collect().toSet
    assert(out.map(_._2).sum == slice.size.toLong) // docs partitioned
    out.foreach { case (_, n, c, m) => assert(c <= n && m <= n) }
    // brute-force: union-find over the pairs, then check every cluster
    // lands wholly in ONE split bucket (leakage-free by construction)
    val pairs = TextOps.md5LshScoredPairs(spark, sfDir)
      .select($"id1", $"id2").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    def bucket(rep: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(rep.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    def splitOf(doc: Long): String = {
      val b = bucket(find(doc))
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    // every pair's two docs share a split (no near-dup leaks across)
    pairs.foreach { case (a, b) =>
      assert(splitOf(a) == splitOf(b), s"pair ($a,$b) straddles splits")
    }
    // per-split doc counts match the brute-force assignment
    val expect = slice.groupBy(splitOf).map { case (k, v) => k -> v.size.toLong }
    assert(out.map(r => r._1 -> r._2).toMap == expect)
  }

  test("q151: duplicate-mass spectrum equals a driver-side recompute") {
    import spark.implicits._
    // recompute CDC chunking from raw text on the driver: boundary AFTER
    // any token whose md5 7-hex prefix % 8 == 0 (the q107 rule)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def chunksOf(toks: Seq[String]): Seq[Seq[String]] = {
      val out = Seq.newBuilder[Seq[String]]
      var cur = Seq.newBuilder[String]
      var n = 0
      toks.foreach { t =>
        cur += t; n += 1
        if (java.lang.Long.parseLong(md5hex(t).take(7), 16) % 8 == 0) {
          out += cur.result(); cur = Seq.newBuilder[String]; n = 0
        }
      }
      if (n > 0) out += cur.result()
      out.result()
    }
    val texts = Tables(spark, sfDir, "documents")
      .select($"text".as[String]).collect().toSeq
    val occ = texts.flatMap(t => chunksOf(t.split("\\s+").toSeq))
      .map(c => (c.mkString(" "), c.length.toLong))
      .groupBy(_._1).toSeq // toSeq BEFORE mapping to pairs: mapping a
      .map { case (_, xs) => (xs.size.toLong, xs.head._2) }
      // Map to (occ, ch_tok) pairs would re-key by occ and deduplicate
    def rk(o: Long) = if (o == 1) 0 else if (o == 2) 1 else if (o <= 4) 2
      else if (o <= 8) 3 else if (o <= 16) 4 else 5
    val byBucket = occ.groupBy { case (o, _) => rk(o) }
    val names = Seq("1", "2", "3-4", "5-8", "9-16", "17+")
    val expected = names.zipWithIndex.map { case (b, r) =>
      val xs = byBucket.getOrElse(r, Seq.empty)
      (b, xs.size.toLong, xs.map(_._1).sum,
        xs.map { case (o, tk) => (o - 1) * tk }.sum)
    }
    val got = run("q151_dup_spectrum")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._3).sum ==
      texts.map(t => chunksOf(t.split("\\s+").toSeq).size.toLong).sum,
      "occurrences across buckets must cover every chunk")
  }

  test("q107: CDC chunking is insertion-robust where a fixed grid is not") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"w$i")
    val orig = Seq.fill(200)(vocab(rnd.nextInt(vocab.size)))
    val inserted = (orig.take(100) :+ "INSERTED") ++ orig.drop(100)
    def chunksOf(toks: Seq[String]): Seq[String] =
      PipelineOps.cdcChunks(
        Seq(("d", toks)).toDF("doc_id", "toks"))
        .select($"chunk").as[String].collect().toSeq
    val a = chunksOf(orig)
    val b = chunksOf(inserted)
    // token mass is conserved through chunking
    assert(a.map(_.split(" ").length).sum == orig.length)
    assert(b.map(_.split(" ").length).sum == inserted.length)
    // the insertion redraws ONLY the chunk containing position 100 —
    // every other chunk survives verbatim (multiset intersection)
    val common = a.groupBy(identity).map { case (c, xs) =>
      math.min(xs.size, b.count(_ == c))
    }.sum
    assert(common >= a.size - 1, s"CDC lost ${a.size - common} chunks")
    // fixed 16-token grid loses every chunk after the insertion point
    def grid(toks: Seq[String]) = toks.grouped(16).map(_.mkString(" ")).toSeq
    val (ga, gb) = (grid(orig), grid(inserted))
    val gridCommon = ga.groupBy(identity).map { case (c, xs) =>
      math.min(xs.size, gb.count(_ == c))
    }.sum
    assert(gridCommon <= ga.size / 2,
      s"grid unexpectedly robust: $gridCommon of ${ga.size}")
    assert(common > gridCommon, "CDC must beat the grid on insertions")
  }

  test("q95: z-order cells are narrow rectangles that partition the table") {
    import spark.implicits._
    val out = run("q95_zorder_layout").cache()
    val orders = Tables(spark, sfDir, "orders")
    assert(out.select(sum($"n_rows")).as[Long].head() == orders.count())
    val ckMax = orders.select(max($"o_custkey")).as[Long].head()
    val dyMax = orders
      .select(max(datediff(to_date($"o_orderdate"), to_date(lit("1992-01-01")))))
      .as[Int].head().toLong
    // a cell fixes the top-2 bits of both normalized dims -> span <= max/4
    out.select($"ck_hi" - $"ck_lo", $"dy_hi" - $"dy_lo")
      .as[(Long, Long)].collect().foreach { case (cs, ds) =>
        assert(cs <= ckMax / 4 + 2, s"custkey span $cs too wide")
        assert(ds <= dyMax / 4 + 2, s"day span $ds too wide")
      }
  }

  test("q110: two-round mass propagation equals driver-side brute force") {
    import spark.implicits._
    val li = Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey".as[Long], $"l_suppkey".as[Long]).collect()
    val ord = Tables(spark, sfDir, "orders")
      .select($"o_orderkey".as[Long], $"o_custkey".as[Long])
      .collect().toMap
    val edges = li.map { case (ok, sk) => (ord(ok), sk) }.distinct
    val oc = edges.groupBy(_._1).map { case (c, es) => (c, es.length.toLong) }
    val os = edges.groupBy(_._2).map { case (s, es) => (s, es.length.toLong) }
    val a1 = edges.groupBy(_._2).map { case (s, es) =>
      (s, es.map { case (c, _) => 1000000L / oc(c) }.sum)
    }
    val m1 = edges.groupBy(_._1).map { case (c, es) =>
      (c, es.map { case (_, s) => a1(s) / os(s) }.sum)
    }
    val a2 = edges.groupBy(_._2).map { case (s, es) =>
      (s, es.map { case (c, _) => m1(c) / oc(c) }.sum)
    }
    val expected = a2.toSeq.sortBy { case (s, m) => (-m, s) }.take(20)
      .map { case (s, m) => (s, os(s), a1(s), m) }
    val got = run("q110_graph_rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // mass is conserved up to floor-division loss: round-1 total can only
    // shrink relative to the injected mass
    val injected = oc.size.toLong * 1000000L
    assert(a1.values.sum <= injected && a1.values.sum > injected / 2)
  }

  test("q109: surprisal bits match brute force; flags are outliers only") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id".as[Long], $"text".as[String],
        $"lang".as[String], $"source".as[String]).collect()
    val toks = docs.flatMap { case (id, t, l, src) =>
      t.split("\\s+", -1).map(tok => (id, l, src, tok)) }
    val cnt = toks.groupBy(_._4).map { case (k, xs) => (k, xs.length.toLong) }
    val n = cnt.values.sum
    def fl2(x: Long) = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val perDoc = toks.groupBy(t => (t._1, t._2, t._3)).map { case (k, xs) =>
      val sb = xs.map(t => (fl2(n) - fl2(cnt(t._4))).toLong).sum
      (k, sb, xs.length.toLong, sb * 1000 / xs.length)
    }
    val cp = perDoc.map(_._2).sum * 1000 / perDoc.map(_._3).sum
    val expected = perDoc.groupBy { case ((_, l, src), _, _, _) => (l, src) }
      .map { case ((l, src), ds) =>
        (l, src, ds.size.toLong,
          ds.map(_._4).sum / ds.size,
          ds.map(_._4).max,
          ds.count(_._4 * 10 > cp * 12).toLong)
      }.toSeq.sortBy(r => (r._1, r._2))
    val got = TextOps.defs("q109_unigram_surprisal")(spark, sfDir)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // every flagged doc is strictly above the corpus mean; not all docs flag
    assert(got.map(_._6).sum < docs.length)
  }

  test("q111: postings are the first 20 sorted doc_ids; df/tf consistent") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id".as[Long], $"text".as[String]).collect()
    val pairs = docs.flatMap { case (id, t) =>
      t.split("\\s+", -1).map(tok => (tok, id)) }
    val expected = pairs.groupBy(_._1).map { case (tok, xs) =>
      val ids = xs.map(_._2)
      val post = ids.distinct.sorted.take(20).mkString(",")
      (tok, ids.distinct.length.toLong, ids.length.toLong, post)
    }.toSeq.sortBy { case (tok, df, _, _) => (-df, tok) }.take(50)
    val got = TextOps.defs("q111_inverted_index")(spark, sfDir)
      .as[(String, Long, Long, String)].collect().toSeq
    assert(got == expected)
    got.foreach { case (_, df, tf, post) =>
      assert(tf >= df && post.split(",").length == math.min(df, 20L))
    }
  }

  test("q112: BM25 ranking equals integer brute force; score monotone in tf") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id".as[Long], $"text".as[String]).collect()
    val toks = docs.map { case (id, t) => (id, t.split("\\s+", -1).toSeq) }
    val dl = toks.map { case (id, ts) => (id, ts.length.toLong) }.toMap
    val nDocs = docs.length.toLong
    val avgMil = dl.values.sum * 1000 / nDocs
    val pairs = toks.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (tok, xs) => (tok, id, xs.length.toLong) }
    }
    val dfm = pairs.groupBy(_._1).map { case (t, xs) => (t, xs.length.toLong) }
    val qt = dfm.toSeq.sortBy { case (t, df) => (-df, t) }.take(3)
      .map { case (t, df) => (t, 1000L * nDocs / df) }.toMap
    val scores = pairs.filter(p => qt.contains(p._1))
      .groupBy(_._2).map { case (id, xs) =>
        val s = xs.map { case (t, _, tf) =>
          qt(t) * 44 * avgMil * tf /
            (20 * avgMil * tf + 6 * avgMil + 18 * dl(id) * 1000)
        }.sum
        (id, xs.length.toLong, s)
      }
    val expected = scores.toSeq.sortBy { case (id, _, s) => (-s, id) }.take(10)
    val got = TextOps.defs("q112_bm25_topk")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // BM25 term score increases with tf (fixed len): saturation, not decay
    def term(tf: Long, len: Long, idf: Long) =
      idf * 44 * avgMil * tf / (20 * avgMil * tf + 6 * avgMil + 18 * len * 1000)
    val idf0 = qt.values.head
    (1L until 20L).foreach { tf =>
      assert(term(tf + 1, 100, idf0) >= term(tf, 100, idf0))
    }
  }

  test("q117: novelty rate equals brute force over sliding 8-grams") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
      .select($"source".as[String], $"text".as[String]).collect()
    val pairs = docs.flatMap { case (src, t) =>
      val toks = t.split("\\s+", -1)
      if (toks.length < 8) Seq.empty
      else toks.sliding(8).map(w => (src, w.mkString(" "))).toSeq
    }.distinct
    val spread = pairs.groupBy(_._2).map { case (g, xs) =>
      (g, xs.map(_._1).distinct.size) }
    val expected = pairs.groupBy(_._1).map { case (src, xs) =>
      val novel = xs.count(p => spread(p._2) == 1).toLong
      (src, xs.size.toLong, novel, 1000 * novel / xs.size)
    }.toSeq.sortBy(_._1)
    val got = run("q117_source_novelty")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // novelty and overlap are complements: a gram in >1 source is not novel
    got.foreach { case (_, n, novel, pm) =>
      assert(novel <= n && pm <= 1000)
    }
  }

  test("q119: systematic sample equals brute force; heavy docs always in") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
      .select($"lang".as[String], $"doc_id".as[Long], $"n_chars".as[Long])
      .collect()
    val expected = docs.groupBy(_._1).map { case (lang, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      val mass = ordered.map(_._3).sum
      val stride = math.max(mass / 50, 1)
      var cum = 0L
      val sel = ordered.map { r =>
        val before = cum; cum += r._3
        (r._2, r._3, before / stride != cum / stride)
      }
      val chosen = sel.filter(_._3)
      (lang, ordered.length.toLong, chosen.length.toLong,
        chosen.map(_._2).sum, mass,
        chosen.map(_._1).min, chosen.map(_._1).max)
    }.toSeq.sortBy(_._1)
    val got = run("q119_weighted_sample")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // selected docs cover every stride boundary: one per boundary unless
    // a single heavy doc spans several, so count is bounded by the
    // boundary count and can never be zero for nonzero mass
    docs.groupBy(_._1).foreach { case (lang, rows) =>
      val mass = rows.map(_._3).sum
      val stride = math.max(mass / 50, 1)
      val nSel = got.find(_._1 == lang).get._3
      assert(nSel >= 1 && nSel <= mass / stride,
        s"$lang: $nSel selected of ${mass / stride} boundaries")
    }
  }

  test("q120: fuzzy matches equal a brute-force Levenshtein scan") {
    import spark.implicits._
    val keys = Tables(spark, sfDir, "documents")
      .select($"doc_id".as[Long], $"text".as[String]).collect()
      .map { case (id, t) => (id, t.take(20)) }
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    val probes = keys.filter(_._1 % 401 == 0)
      .map { case (id, k) => (id, k.take(18) + "zz") }
    val expected = probes.map { case (pid, probe) =>
      val ds = keys.map { case (id, k) => (id, lev(k, probe).toLong) }
        .filter(_._2 <= 4)
      (pid, ds.length.toLong, ds.map(_._2).min,
        ds.minBy { case (id, dd) => (dd, id) }._1)
    }.toSeq.sortBy(_._1)
    val got = TextOps.defs("q120_fuzzy_match")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    // each probe's source doc is a 2-edit mutation of its own key, so it
    // must always appear among the matches
    got.zip(expected).foreach { case ((pid, n, best, _), _) =>
      assert(n >= 1 && best <= 2, s"probe $pid lost its source doc")
    }
  }

  test("q126: novelty curve conserves docs and uniques; dup rate sane") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = run("q126_novelty_curve")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val docs = Tables(spark, sfDir, "documents")
    assert(out.map(_._2).sum == docs.count(), "slices partition the corpus")
    val uniques = docs.select(md5($"text")).distinct().count()
    assert(out.map(_._3).sum == uniques, "new_uniques must sum to distinct")
    assert(out.last._4 == uniques, "curve must end at the distinct count")
    // cumulative uniques are non-decreasing and dup rate is a permille
    out.sliding(2).foreach {
      case Seq(a, b) => assert(a._4 <= b._4)
      case _ =>
    }
    out.foreach { case (_, n, nu, _, pm) =>
      assert(nu <= n && pm >= 0 && pm <= 1000)
    }
  }

  test("q134: prefix-filter setsim join equals brute-force all-pairs") {
    import spark.implicits._
    // driver-side brute force over ALL pairs at sf0.001 — the prefix
    // filter must lose nothing (exactness is the operator's contract)
    val sets = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => (id, t.split("\\s+").toSet) }
      .sortBy(_._1)
    val expected = (for {
      i <- sets.indices; j <- (i + 1) until sets.length
      (id1, s1) = sets(i); (id2, s2) = sets(j)
      inter = (s1 & s2).size.toLong
      un = (s1.size + s2.size).toLong - inter
      if inter * 20 >= un * 19
    } yield (id1, id2, inter, un, 1000 * inter / un)).toSeq
    val got = TextOps.defs("q134_setsim_prefix_join")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected.sortBy(p => (p._1, p._2)),
      s"prefix join returned ${got.length} pairs, brute force ${expected.length}")
  }

  test("q133: source quota keeps exactly the per-source top-8") {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
      .select($"source", $"n_chars", $"doc_id")
      .as[(String, Long, Long)].collect()
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.sortBy(r => (-r._2, r._3)).take(8).zipWithIndex
        .map { case ((_, nc, id), i) => (id, src, nc, (i + 1).toLong) }
    }.sortBy(r => (r._2, r._4))
    val got = run("q133_source_quota")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("q135: token budget is a greedy quality-ordered prefix per lang") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sfDir, "documents")
      .select($"lang", $"n_chars", $"doc_id",
        size(split($"text", "\\s+")).cast("long").as("n_tok"))
      .as[(String, Long, Long, Long)].collect()
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      val cums = rows.sortBy(r => (-r._2, r._3)).scanLeft(0L)(_ + _._4).tail
      val kept = cums.takeWhile(_ <= 3000L)
      if (kept.isEmpty) None
      else Some((lang, kept.length.toLong, kept.last, 1000L * kept.last / 3000L))
    }.sortBy(_._1)
    val got = run("q135_token_budget")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }
}
