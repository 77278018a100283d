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
}
