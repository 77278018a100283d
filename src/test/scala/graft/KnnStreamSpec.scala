package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps

/** Streaming top-k vector search vs driver-side brute force: exact
  * integer distances mean the comparison is equality, not tolerance —
  * including (dist, vec_id) tie-breaks, under any arrival batching.
  */
class KnnStreamSpec extends SparkSpec {

  test("streaming knn emits exactly the brute-force top-5 per query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = Tables(spark, sfDir, "embeddings")
      .select($"vec_id".as[Long], $"embedding".as[Array[Float]]).collect()
    def quant(v: Array[Float]) =
      v.map(x => math.floor(x.toDouble * 1000.0 + 0.5).toLong)
    val index = emb.filter(_._1 < 200).map { case (id, v) => (id, quant(v)) }
    val queries = emb.filter(_._1 % 50 == 0).take(20).map { case (id, v) =>
      StreamOps.VecEvent(id, new java.sql.Timestamp(1_436_918_400_000L), quant(v))
    }
    val in = MemoryStream[StreamOps.VecEvent]
    val q = StreamOps.toMemory(
      StreamOps.knnStream(in.toDS(), index, 5).toDF(), "knn_test",
      OutputMode.Append)
    try {
      // split across two micro-batches: results must not depend on batching
      in.addData(queries.take(7).toSeq)
      q.processAllAvailable()
      in.addData(queries.drop(7).toSeq)
      q.processAllAvailable()
      val got = spark.table("knn_test").as[StreamOps.KnnMatch].collect()
        .groupBy(_.qid).view
        .mapValues(_.sortBy(_.rank).map(m => (m.vec_id, m.dist)).toSeq).toMap
      val expected = queries.map { qe =>
        val top = index.map { case (id, v) =>
          val dist = v.zip(qe.qv).map { case (a, b) => (a - b) * (a - b) }.sum
          (dist, id)
        }.sorted.take(5).map { case (d, id) => (id, d) }.toSeq
        qe.qid -> top
      }.toMap
      assert(got == expected)
      // a query that IS an index vector must rank itself first at dist 0
      got.filterKeys(_ < 200).foreach { case (qid, ms) =>
        assert(ms.head == ((qid, 0L)), s"$qid should match itself first")
      }
    } finally q.stop()
  }

  test("dim-mismatched queries are flagged with a rank -1 sentinel, not scored") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val index = (0L until 10L).map(i =>
      (i, Array.fill(8)(i * 10))).toArray
    val t = new java.sql.Timestamp(1_436_918_400_000L)
    val in = MemoryStream[StreamOps.VecEvent]
    val q = StreamOps.toMemory(
      StreamOps.knnStream(in.toDS(), index, 3).toDF(), "knn_dim_test",
      OutputMode.Append)
    try {
      in.addData(
        StreamOps.VecEvent(1L, t, Array.fill(8)(0L)),  // well-formed
        StreamOps.VecEvent(2L, t, Array.fill(5)(0L)),  // too short
        StreamOps.VecEvent(3L, t, Array.fill(12)(0L))) // too long
      q.processAllAvailable()
      val got = spark.table("knn_dim_test").as[StreamOps.KnnMatch].collect()
        .groupBy(_.qid)
      assert(got(1L).map(_.rank).sorted.toSeq == Seq(1, 2, 3))
      // corrupt queries emit exactly one sentinel and zero neighbors
      Seq(2L, 3L).foreach { qid =>
        assert(got(qid).toSeq == Seq(StreamOps.KnnMatch(qid, -1, -1L, -1L)),
          s"query $qid must be flagged, not truncated-and-scored")
      }
    } finally q.stop()
  }

  test("a ragged static index is rejected at construction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamOps.VecEvent]
    val bad = Array((1L, Array.fill(8)(0L)), (2L, Array.fill(9)(0L)))
    assertThrows[IllegalArgumentException] {
      StreamOps.knnStream(in.toDS(), bad, 3)
    }
  }

  test("stored-index serve stream == batch serve, and sees a generation committed mid-stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.{IvfIndex, VectorOps}
    spark.conf.set("spark.graft.index.retainEpochs", "2")
    val emb = VectorOps.quantized(spark, sfDir)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_knn_store").toString + "/idx"
    IvfIndex.build(emb.filter($"vec_id" % 5 =!= 0), dir)
    def vecEvents(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"qv").as[(Long, Array[Long])].collect()
        .map { case (id, v) => StreamOps.VecEvent(id,
          new java.sql.Timestamp(1_436_918_400_000L + id), v) }.toSeq
    val batch1 = vecEvents(emb.filter($"vec_id" % 100 === 0))
    val batch2 = vecEvents(emb.filter($"vec_id" % 100 === 50))
    def served(qdf: org.apache.spark.sql.DataFrame) =
      IvfIndex.serve(spark, dir, qdf)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    def qdf(es: Seq[StreamOps.VecEvent]) =
      es.map(e => (e.qid, e.qv.toSeq)).toDF("vec_id", "qv")
    // expected batch-1 results come from the PRE-ingest store, so
    // compute them before the mid-stream commit mutates it
    val expected1 = served(qdf(batch1))
    val got = scala.collection.mutable.Map[Long, Set[(Long, Long, Long, Long, Long)]]()
    val in = MemoryStream[StreamOps.VecEvent]
    val q = StreamOps.knnIndexServeStream(in.toDS(), dir) { (df, bid) =>
      got.synchronized {
        got(bid) = df.as[(Long, Long, Long, Long, Long)].collect().toSet
      }
    }
    try {
      in.addData(batch1)
      q.processAllAvailable()
      // a generation lands BETWEEN triggers: the next batch must serve
      // from the new manifest without a restart
      IvfIndex.addBatch(spark, dir, emb.filter($"vec_id" % 5 === 0))
      in.addData(batch2)
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.conf.unset("spark.graft.index.retainEpochs")
    }
    assert(got.values.exists(_ == expected1),
      "first trigger must equal the pre-ingest batch serve")
    val expected2 = served(qdf(batch2))
    assert(got.values.exists(_ == expected2),
      "second trigger must equal the POST-ingest batch serve")
    assert(expected1 != expected2 ||
      got.size == 2, "fixture should exercise two distinct triggers")
  }
}
