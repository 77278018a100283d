package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, TextOps, VectorOps}
import graft.streaming.StreamOps

/** Streaming hybrid retrieval (BM25 + stored-index dense, RRF-fused):
  * the stream equals the batch fusion at every batching boundary, the
  * per-query results are batching-invariant, a mid-stream index commit
  * is visible to the next trigger, and the serve-retention guard
  * holds.
  */
class HybridStreamSpec extends SparkSpec {

  private def tmp(n: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_hy_$n").toString + "/ix"

  test("stream == batch hybrid fusion at every batching boundary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withIndexRetention(2) {
    val dir = tmp("fuse")
    val emb = VectorOps.quantized(spark, sfDir)
    IvfIndex.build(emb, dir)
    val stats = TextOps.bm25Stats(spark, sfDir)
    // checkpoint the serving config once, as a deployment would
    val fixed = TextOps.Bm25Stats(stats.pairs.localCheckpoint(true),
      stats.dfRel.localCheckpoint(true), stats.dl.localCheckpoint(true),
      stats.nAvg.localCheckpoint(true))
    val qdocs = Tables(spark, sfDir, "documents")
      .filter($"doc_id" % 100 === 0)
      .join(emb.select($"vec_id".as("doc_id"), $"qv"), "doc_id")
      .select($"doc_id", $"text", $"qv")
      .as[(Long, String, Array[Long])].collect()
    val t = new java.sql.Timestamp(1_436_918_400_000L)
    val events = qdocs.map { case (id, tx, qv) =>
      StreamOps.HybridQuery(id, t, tx, qv) }
    assert(events.length >= 3, "fixture needs enough queries to split")
    val in = MemoryStream[StreamOps.HybridQuery]
    val emitted = scala.collection.mutable.Buffer[(Long,
      Seq[(Long, Long, Long, Long, Long, Long)])]()
    val q = StreamOps.hybridServeStream(in.toDS(), fixed, dir) {
      (df, bid) => emitted += bid ->
        df.as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    }
    try {
      in.addData(events.take(2).toSeq)
      q.processAllAvailable()
      in.addData(events.drop(2).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    assert(emitted.size === 2)
    val batches = Seq(events.take(2).toSeq, events.drop(2).toSeq)
    emitted.sortBy(_._1).zip(batches).foreach { case ((_, got), evs) =>
      val want = StreamOps.hybridServeBatch(
          evs.map(e => (e.qid, e.text, e.qv))
            .toDF("qid", "text", "qv"), fixed, dir)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      assert(got === want)
    }
    // per-query independence: the union equals the all-at-once serve
    val all = StreamOps.hybridServeBatch(
        events.toSeq.map(e => (e.qid, e.text, e.qv)).toDF("qid", "text", "qv"),
        fixed, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(emitted.flatMap(_._2).sortBy(r => (r._1, r._2)) ===
      all.sortBy(r => (r._1, r._2)))
    // both systems contribute to the fixture's fusion
    val rows = all
    assert(rows.exists(_._5 > 0L) && rows.exists(_._6 > 0L),
      "fixture should retrieve through both the sparse and dense system")
  }}

  test("a mid-stream index commit is visible to the next trigger") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withIndexRetention(2) {
    val dir = tmp("commit")
    val emb = VectorOps.quantized(spark, sfDir)
    // build WITHOUT half the corpus; ingest it mid-stream
    IvfIndex.build(emb.filter($"vec_id" % 2 === 0), dir)
    val stats = TextOps.bm25Stats(spark, sfDir)
    val fixed = TextOps.Bm25Stats(stats.pairs.localCheckpoint(true),
      stats.dfRel.localCheckpoint(true), stats.dl.localCheckpoint(true),
      stats.nAvg.localCheckpoint(true))
    val one = Tables(spark, sfDir, "documents")
      .filter($"doc_id" === 100L)
      .join(emb.select($"vec_id".as("doc_id"), $"qv"), "doc_id")
      .select($"doc_id", $"text", $"qv")
      .as[(Long, String, Array[Long])].head()
    val t = new java.sql.Timestamp(1_436_918_400_000L)
    val ev = StreamOps.HybridQuery(one._1, t, one._2, one._3)
    val in = MemoryStream[StreamOps.HybridQuery]
    val emitted = scala.collection.mutable.Buffer[
      Seq[(Long, Long, Long, Long, Long, Long)]]()
    val q = StreamOps.hybridServeStream(in.toDS(), fixed, dir) {
      (df, _) => emitted +=
        df.as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    }
    try {
      in.addData(Seq(ev)); q.processAllAvailable()
      IvfIndex.addBatch(spark, dir,
        emb.filter($"vec_id" % 2 === 1).select($"vec_id", $"qv"), gen = 1L)
      in.addData(Seq(ev)); q.processAllAvailable()
    } finally q.stop()
    assert(emitted.size === 2)
    // the post-commit serve equals the batch reference on the grown
    // store — and differs from the pre-commit one iff the new half
    // changed this query's dense candidates (it does on the fixture)
    val after = StreamOps.hybridServeBatch(
        Seq((ev.qid, ev.text, ev.qv)).toDF("qid", "text", "qv"),
        fixed, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(emitted(1) === after)
    assert(emitted(0) !== emitted(1),
      "the ingested half should change the dense ranking on the fixture")
  }}

  test("the serve-retention guard refuses retainEpochs = 1") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.graft.index.retainEpochs")
    spark.conf.set("spark.graft.index.retainEpochs", "1")
    try {
      val stats = TextOps.bm25Stats(spark, sfDir)
      val in = MemoryStream[StreamOps.HybridQuery]
      val ex = intercept[IllegalArgumentException] {
        StreamOps.hybridServeStream(in.toDS(), stats, "/nonexistent") {
          (_, _) => () }
      }
      assert(ex.getMessage.contains("retainEpochs"))
    } finally prev.fold(
      spark.conf.unset("spark.graft.index.retainEpochs"))(
      spark.conf.set("spark.graft.index.retainEpochs", _))
  }
}
