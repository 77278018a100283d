package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, VectorOps}
import graft.streaming.StreamOps

/** The online index-maintenance sink and its interaction with a LIVE
  * serving stream on the SAME index directory — the two halves of a
  * streaming vector store exercised together, which is exactly what the
  * manifest commit protocol exists for: the ingest stream commits
  * generations and periodic compactions while the serve stream re-opens
  * the manifest every trigger, and each serve must equal the batch
  * serve against whatever snapshot was committed at that moment.
  */
class IndexStreamSpec extends SparkSpec {

  private def dir(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_idxstream_$name")
      .toString + "/idx"

  private def toIndexVecs(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    df.select($"vec_id", $"qv").as[(Long, Seq[Long])].collect()
      .map { case (id, v) => StreamOps.IndexVec(id, v.toArray) }.toSeq
  }

  test("indexIngestStream commits one generation per batch and compacts on cadence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = VectorOps.quantized(spark, sfDir)
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val d = dir("ingest")
    IvfIndex.build(base, d)
    val fifth = emb.filter($"vec_id" % 5 === 0)
    val b1 = toIndexVecs(fifth.filter($"vec_id" % 10 === 0))
    val b2 = toIndexVecs(fifth.filter($"vec_id" % 10 =!= 0))
    val in = MemoryStream[StreamOps.IndexVec]
    val q = StreamOps.indexIngestStream(in.toDS(), d, compactEvery = 2L)
    try {
      in.addData(b1)
      q.processAllAvailable()
      // batch 0 -> generation 1, not yet compacted
      val gens1 = IvfIndex.postings(spark, d)
        .select($"gen").distinct().as[Long].collect().toSet
      assert(gens1 === Set(0L, 1L), s"after batch 0: $gens1")
      in.addData(b2)
      q.processAllAvailable()
      // batch 1 -> generation 2, then the cadence compaction folds all
      val gens2 = IvfIndex.postings(spark, d)
        .select($"gen").distinct().as[Long].collect().toSet
      assert(gens2 === Set(0L), s"after cadence compact: $gens2")
      // content is exactly base + both batches, each stored once
      assert(IvfIndex.postings(spark, d).count()
        === base.count() + fifth.count())
      val stored = IvfIndex.postings(spark, d)
        .select($"vec_id").as[Long].collect().sorted
      val want = emb.select($"vec_id").as[Long].collect().sorted
      assert(stored.toSeq === want.toSeq)
    } finally q.stop()
  }

  test("a live serve stream tracks a live ingest stream's commits, batch-equal at every point") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the serve streams' retention contract: a mutator sharing the dir
    // needs one epoch of GC slack (construction enforces >= 2)
    spark.conf.set("spark.graft.index.retainEpochs", "2")
    val emb = VectorOps.quantized(spark, sfDir)
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val d = dir("concurrent")
    IvfIndex.build(base, d)
    val fifth = emb.filter($"vec_id" % 5 === 0)
    val b1 = toIndexVecs(fifth.filter($"vec_id" % 10 === 0))
    val b2 = toIndexVecs(fifth.filter($"vec_id" % 10 =!= 0))
    val queries = emb.filter($"vec_id" % 100 === 0)
    val queryEvents = queries.select($"vec_id", $"qv")
      .as[(Long, Seq[Long])].collect()
      .map { case (id, v) => StreamOps.VecEvent(id,
        new java.sql.Timestamp(1_436_918_400_000L + id), v.toArray) }.toSeq
    def batchServe(): Set[(Long, Long, Long, Long, Long)] =
      IvfIndex.serve(spark, d, queries)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    val served = scala.collection.mutable.ArrayBuffer[Set[(Long, Long, Long, Long, Long)]]()
    val ingestIn = MemoryStream[StreamOps.IndexVec]
    val serveIn = MemoryStream[StreamOps.VecEvent]
    val ingest = StreamOps.indexIngestStream(ingestIn.toDS(), d,
      compactEvery = 2L)
    val serve = StreamOps.knnIndexServeStream(serveIn.toDS(), d) { (df, _) =>
      served.synchronized {
        served += df.as[(Long, Long, Long, Long, Long)].collect().toSet
      }
    }
    try {
      // serve 1: against the freshly built store
      val expect0 = batchServe()
      serveIn.addData(queryEvents); serve.processAllAvailable()
      // ingest generation 1, then serve 2 against the grown store
      ingestIn.addData(b1); ingest.processAllAvailable()
      val expect1 = batchServe()
      serveIn.addData(queryEvents); serve.processAllAvailable()
      // ingest generation 2 (+ cadence compaction), serve 3 after fold
      ingestIn.addData(b2); ingest.processAllAvailable()
      val expect2 = batchServe()
      serveIn.addData(queryEvents); serve.processAllAvailable()
      assert(served.size === 3)
      assert(served(0) === expect0, "serve 1 != pre-ingest batch serve")
      assert(served(1) === expect1, "serve 2 != post-gen-1 batch serve")
      assert(served(2) === expect2, "serve 3 != post-compaction batch serve")
      // the fixture must actually change what is served as data lands
      assert(expect0 !== expect1,
        "ingest should change some top-k on this fixture")
    } finally {
      ingest.stop(); serve.stop()
      spark.conf.unset("spark.graft.index.retainEpochs")
    }
  }

  test("the PQ tier streams too: packed-code ingest + live ADC serve, batch-equal") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.graft.index.retainEpochs", "2")
    val emb = VectorOps.quantized(spark, sfDir)
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val d = dir("pq")
    IvfIndex.buildPq(base, d)
    val fifth = emb.filter($"vec_id" % 5 === 0)
    val b1 = toIndexVecs(fifth.filter($"vec_id" % 10 === 0))
    val b2 = toIndexVecs(fifth.filter($"vec_id" % 10 =!= 0))
    val queries = emb.filter($"vec_id" % 100 === 0)
    val queryEvents = queries.select($"vec_id", $"qv")
      .as[(Long, Seq[Long])].collect()
      .map { case (id, v) => StreamOps.VecEvent(id,
        new java.sql.Timestamp(1_436_918_400_000L + id), v.toArray) }.toSeq
    def batchServe(): Set[(Long, Long, Long, Long)] =
      IvfIndex.servePq(spark, d, queries)
        .as[(Long, Long, Long, Long)].collect().toSet
    val served = scala.collection.mutable.ArrayBuffer[Set[(Long, Long, Long, Long)]]()
    val ingestIn = MemoryStream[StreamOps.IndexVec]
    val serveIn = MemoryStream[StreamOps.VecEvent]
    val ingest = StreamOps.pqIndexIngestStream(ingestIn.toDS(), d,
      compactEvery = 2L)
    val serve = StreamOps.knnPqIndexServeStream(serveIn.toDS(), d) { (df, _) =>
      served.synchronized {
        served += df.as[(Long, Long, Long, Long)].collect().toSet
      }
    }
    try {
      val expect0 = batchServe()
      serveIn.addData(queryEvents); serve.processAllAvailable()
      ingestIn.addData(b1); ingest.processAllAvailable()
      val expect1 = batchServe()
      serveIn.addData(queryEvents); serve.processAllAvailable()
      ingestIn.addData(b2); ingest.processAllAvailable()
      // cadence compaction ran; postings are packed codes throughout
      val gens = IvfIndex.postings(spark, d)
        .select($"gen").distinct().as[Long].collect().toSet
      assert(gens === Set(0L), s"after cadence compact: $gens")
      val expect2 = batchServe()
      serveIn.addData(queryEvents); serve.processAllAvailable()
      assert(served.size === 3)
      assert(served(0) === expect0, "PQ serve 1 != pre-ingest batch serve")
      assert(served(1) === expect1, "PQ serve 2 != post-gen-1 batch serve")
      assert(served(2) === expect2, "PQ serve 3 != post-compaction batch serve")
      assert(expect0 !== expect1,
        "PQ ingest should change some top-k on this fixture")
    } finally {
      ingest.stop(); serve.stop()
      spark.conf.unset("spark.graft.index.retainEpochs")
    }
  }
}
