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
}
