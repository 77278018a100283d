package graft

/** q177 epoch-order manifest: the loader-facing invariants — positions
  * are dense 1..n per (epoch, shard), every epoch delivers exactly the
  * upsampled corpus, upsampled copies follow the n_chars rule, the
  * permutation is decorrelated across epochs but identical across
  * reruns.
  */
class EpochOrderSpec extends SparkSpec {

  test("manifest is a dense per-shard order over the upsampled corpus, stable across reruns") {
    import spark.implicits._
    val got = SparkEntry.queries("q177_epoch_order")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id".as[Long], $"n_chars".as[Long]).collect().toSeq
    val wantIds = docs.flatMap { case (id, nc) =>
      if (nc >= 400L) Seq((id, 0L), (id, 1L)) else Seq((id, 0L))
    }.sorted

    assert(got.map(_._1).distinct.sorted === Seq(0L, 1L, 2L))
    (0L to 2L).foreach { e =>
      val ep = got.filter(_._1 == e)
      // every epoch delivers exactly the upsampled corpus
      assert(ep.map(r => (r._4, r._5)).sorted === wantIds)
      // dense positions per shard
      ep.groupBy(_._2).values.foreach { sh =>
        assert(sh.map(_._3).sorted === (1L to sh.size))
      }
    }
    // epochs are different permutations of the same multiset
    val order0 = got.filter(_._1 == 0L).sortBy(r => (r._2, r._3)).map(_._4)
    val order1 = got.filter(_._1 == 1L).sortBy(r => (r._2, r._3)).map(_._4)
    assert(order0 !== order1)
    // and the manifest is rerun-stable
    val again = SparkEntry.queries("q177_epoch_order")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(again === got)
  }

  test("curriculum order delivers each epoch's scheduled multiset exactly") {
    import spark.implicits._
    val got = SparkEntry.queries("q183_curriculum_order")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val tiers = Tables(spark, sfDir, "documents")
      .select($"doc_id".as[Long], $"n_chars".as[Long]).collect()
      .map { case (id, nc) =>
        id -> (if (nc >= 380L) 2L else if (nc >= 220L) 1L else 0L) }
      .toMap
    val sched = Seq(Seq(0, 1, 2), Seq(1, 1, 2), Seq(1, 1, 1))
    assert(tiers.values.toSet === Set(0L, 1L, 2L),
      "fixture must populate all three tiers")
    (0 to 2).foreach { e =>
      val ep = got.filter(_._1 == e)
      // each epoch delivers exactly its scheduled multiset
      val want = tiers.toSeq.flatMap { case (id, t) =>
        (0 until sched(e)(t.toInt)).map(c => (id, t, c.toLong))
      }.sorted
      assert(ep.map(r => (r._4, r._5, r._6)).sorted === want,
        s"epoch $e multiset drift")
      // dense per-shard positions
      ep.groupBy(_._2).values.foreach { sh =>
        assert(sh.map(_._3).sorted === (1L to sh.size))
      }
    }
    // the warmup epoch excludes tier 0 entirely; the final epoch is
    // the uniform mix (one copy of everything)
    assert(!got.exists(r => r._1 == 0L && r._5 == 0L))
    assert(got.count(_._1 == 2L) === tiers.size)
    // epochs remain decorrelated permutations and reruns replay exactly
    val o0 = got.filter(_._1 == 1L).sortBy(r => (r._2, r._3)).map(_._4)
    val o1 = got.filter(_._1 == 2L).sortBy(r => (r._2, r._3)).map(_._4)
    assert(o0.take(o1.size.min(o0.size)) !== o1.take(o1.size.min(o0.size)))
    val again = SparkEntry.queries("q183_curriculum_order")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(again === got)
  }
}
