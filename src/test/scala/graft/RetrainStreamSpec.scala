package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, VectorOps}
import graft.streaming.StreamOps

/** Retrain-while-serving: the drift monitor's signal wired to the
  * maintenance it schedules. A retrain on an UNdrifted corpus is a
  * pure codebook-version flip with bit-identical serving; a drifted
  * ingest stream triggers an in-stream retrain through
  * pqIndexMaintainStream while a concurrent serve stream stays
  * available and batch-equal at every trigger; and the retrained
  * codebook measurably recovers the ADC recall the drift cost.
  */
class RetrainStreamSpec extends SparkSpec {

  private def tmp(n: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_rt_$n").toString + "/ix"

  private def vec(seed: Long, shift: Long): Array[Long] = {
    val rng = new graft.sources.Nexmark.Rng(seed)
    Array.fill(64)((rng.nextInt(401) - 200).toLong + shift)
  }

  test("retrain on the undrifted corpus is a version flip with bit-equal serving") {
    import spark.implicits._
    withIndexRetention(3) {
    val dir = tmp("flip")
    val emb = VectorOps.quantized(spark, sfDir).localCheckpoint(true)
    IvfIndex.buildPq(emb, dir)
    val queries = emb.filter($"vec_id" % 100 === 0)
    val before = IvfIndex.servePq(spark, dir, queries, k = 10)
      .collect().toSeq
    val preEpoch = IvfIndex.readSnapshot(spark, dir).epoch
    IvfIndex.retrainPq(spark, dir, emb)
    val snap = IvfIndex.readSnapshot(spark, dir)
    assert(snap.pqVer === 2L, "retrain must mint a new codebook version")
    // same live set, same seeds, same fixed training rounds -> the
    // retrained codebook is the SAME function -> bit-equal ADC serving
    val after = IvfIndex.servePq(spark, dir, queries, k = 10)
      .collect().toSeq
    assert(after === before)
    // and the pre-retrain epoch still decodes with the OLD codebook
    val pinned = IvfIndex.servePqAt(spark, dir, preEpoch, queries, k = 10)
      .collect().toSeq
    assert(pinned === before)
  }}

  test("a drifted ingest stream triggers an in-stream retrain; serving stays live, batch-equal, and recovers recall") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withIndexRetention(3) {
    val dir = tmp("drift")
    // region A: the build corpus; region B: the drifted ingest mass
    val aVecs = (0L until 800L).map(i => (i, vec(i, 0L)))
    val bVecs = (800L until 1200L).map(i => (i, vec(i, 900L)))
    val corpus = (aVecs ++ bVecs).toDF("vec_id", "qv")
      .localCheckpoint(true)
    IvfIndex.buildPq(aVecs.toDF("vec_id", "qv"), dir)
    val cents = IvfIndex.centroids(spark, dir)
      .select($"cid".cast("long").as("cid"), $"cq")
    val refCounts = VectorOps.argminPacked(
        aVecs.toDF("vec_id", "qv"), cents)
      .groupBy($"cid").agg(count(lit(1)).as("n_c"))

    // drifted queries: near region B
    val queries = (0L until 40L).map(i => (10000L + i, vec(5000L + i, 900L)))
      .toDF("vec_id", "qv").localCheckpoint(true)
    def adcRecall(d: String): Long = {
      // exact top-5 over the store's LIVE contents vs the ADC top-5
      val live = IvfIndex.liveContents(spark, d)
        .select($"vec_id").join(corpus, "vec_id")
      val ex = live.crossJoin(broadcast(queries
          .select($"vec_id".as("query_id"), $"qv".as("q_qv"))))
        .select($"query_id", $"vec_id".as("neighbor"),
          graft.functions.VectorMath.sqDistLong($"qv", $"q_qv").as("dist"))
        .groupBy($"query_id")
        .agg(graft.functions.BoundedAggs.topScored(
          -$"dist".cast("double"), $"neighbor", lit(true), 5).as("top"))
        .select($"query_id", explode($"top").as("t"))
        .select($"query_id", $"t.id".as("neighbor"))
      val got = IvfIndex.servePq(spark, d, queries, k = 5)
        .select($"query_id", $"neighbor")
      ex.join(got, Seq("query_id", "neighbor"), "left_semi").count() * 1000 /
        ex.count()
    }

    // the counterfactual: the same ingest WITHOUT a retrain (a second
    // store, same build + same batch, blind ingest only)
    val dirNo = tmp("noretrain")
    IvfIndex.buildPq(aVecs.toDF("vec_id", "qv"), dirNo)
    IvfIndex.addBatchPq(spark, dirNo, bVecs.toDF("vec_id", "qv"), gen = 1L)
    val recallPre = adcRecall(dirNo)

    // maintain + serve streams on the SAME directory, alternating
    // triggers
    val mIn = MemoryStream[StreamOps.IndexVec]
    val maintain = StreamOps.pqIndexMaintainStream(mIn.toDS(), dir,
      corpus, refCounts, retrainTvd = 300L)
    val sIn = MemoryStream[StreamOps.VecEvent]
    val t = new java.sql.Timestamp(1_436_918_400_000L)
    val qEvents = queries.as[(Long, Array[Long])].collect()
      .map { case (id, qv) => StreamOps.VecEvent(id, t, qv) }
    val emitted = scala.collection.mutable.Buffer[Seq[org.apache.spark.sql.Row]]()
    val refs = scala.collection.mutable.Buffer[Seq[org.apache.spark.sql.Row]]()
    val serve = StreamOps.knnPqIndexServeStream(sIn.toDS(), dir, k = 5) {
      (df, _) => emitted += df.collect().toSeq
    }
    try {
      // trigger 1: serve against the fresh store (pqVer 1)
      sIn.addData(qEvents.toSeq); serve.processAllAvailable()
      refs += IvfIndex.servePq(spark, dir, queries, k = 5).collect().toSeq
      assert(IvfIndex.readSnapshot(spark, dir).pqVer === 1L)
      // trigger 2: the drifted batch lands — TVD vs the A-occupancy
      // reference blows the threshold and the stream retrains in place
      mIn.addData(bVecs.map { case (id, qv) =>
        StreamOps.IndexVec(id, qv) }.toSeq)
      maintain.processAllAvailable()
      assert(IvfIndex.readSnapshot(spark, dir).pqVer === 2L,
        "the drifted batch must trigger an in-stream retrain")
      // trigger 3: the serve stream keeps serving — now decoding with
      // the retrained codebook picked up by the per-epoch cache
      sIn.addData(qEvents.toSeq); serve.processAllAvailable()
      refs += IvfIndex.servePq(spark, dir, queries, k = 5).collect().toSeq
    } finally { serve.stop(); maintain.stop() }
    assert(emitted.size === 2, "serving must stay available across the flip")
    assert(emitted(0) === refs(0) && emitted(1) === refs(1),
      "every serve trigger must equal the batch serve of that moment")
    // the retrained codebook (trained on residuals INCLUDING the
    // drifted mass) must recover ADC recall vs the blind-ingest
    // counterfactual on the same contents
    val recallPost = adcRecall(dir)
    assert(recallPost >= recallPre,
      s"retrained ADC recall $recallPost must not trail the " +
        s"no-retrain counterfactual $recallPre")
    assert(recallPost > 0L)
  }}

  test("an undrifted batch does not trigger a retrain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("calm")
    val aVecs = (0L until 800L).map(i => (i, vec(i, 0L)))
    val more = (800L until 1000L).map(i => (i, vec(i, 0L)))
    IvfIndex.buildPq(aVecs.toDF("vec_id", "qv"), dir)
    val cents = IvfIndex.centroids(spark, dir)
      .select($"cid".cast("long").as("cid"), $"cq")
    val refCounts = VectorOps.argminPacked(
        aVecs.toDF("vec_id", "qv"), cents)
      .groupBy($"cid").agg(count(lit(1)).as("n_c"))
    val mIn = MemoryStream[StreamOps.IndexVec]
    val maintain = StreamOps.pqIndexMaintainStream(mIn.toDS(), dir,
      (aVecs ++ more).toDF("vec_id", "qv"), refCounts, retrainTvd = 300L)
    try {
      mIn.addData(more.map { case (id, qv) =>
        StreamOps.IndexVec(id, qv) }.toSeq)
      maintain.processAllAvailable()
    } finally maintain.stop()
    val snap = IvfIndex.readSnapshot(spark, dir)
    assert(snap.pqVer === 1L,
      "a same-distribution batch must not pay the full-rewrite retrain")
    assert(snap.committedIngest(1L), "the batch itself must have landed")
  }
}
