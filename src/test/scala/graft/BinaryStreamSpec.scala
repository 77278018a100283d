package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps

/** Streaming binary-quantized serving (binaryAnnStream): with the
  * shortlist opened to the whole index the refine pass is the exact
  * scan, so the stream must be BIT-EQUAL to knnStream; with a narrow
  * shortlist it must equal the driver-side two-stage replay, under any
  * batching. Guards mirror knnStream's.
  */
class BinaryStreamSpec extends SparkSpec {

  private def quant(v: Array[Float]) =
    v.map(x => math.floor(x.toDouble * 1000.0 + 0.5).toLong)

  private lazy val (index, queries) = {
    import spark.implicits._
    val emb = Tables(spark, sfDir, "embeddings")
      .select($"vec_id".as[Long], $"embedding".as[Array[Float]]).collect()
    val idx = emb.filter(_._1 < 200).map { case (id, v) => (id, quant(v)) }
    val qs = emb.filter(_._1 % 50 == 0).take(20).map { case (id, v) =>
      StreamOps.VecEvent(id, new java.sql.Timestamp(1_436_918_400_000L),
        quant(v))
    }
    (idx, qs)
  }

  private def run(name: String, shortlist: Int, splits: Seq[Int])
      : Map[Long, Seq[(Long, Long)]] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamOps.VecEvent]
    val q = StreamOps.toMemory(
      StreamOps.binaryAnnStream(in.toDS(), index, shortlist, 5).toDF(),
      name, OutputMode.Append)
    try {
      var rest = queries.toSeq
      (splits :+ Int.MaxValue).foreach { n =>
        val (batch, tail) = rest.splitAt(n)
        if (batch.nonEmpty) { in.addData(batch); q.processAllAvailable() }
        rest = tail
      }
      spark.table(name).as[StreamOps.KnnMatch].collect()
        .groupBy(_.qid).view
        .mapValues(_.sortBy(_.rank).map(m => (m.vec_id, m.dist)).toSeq)
        .toMap.toMap
    } finally q.stop()
  }

  test("full-width shortlist makes the binary stream bit-equal to knnStream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamOps.VecEvent]
    val q = StreamOps.toMemory(
      StreamOps.knnStream(in.toDS(), index, 5).toDF(), "bin_exact_ref",
      OutputMode.Append)
    val want = try {
      in.addData(queries.toSeq); q.processAllAvailable()
      spark.table("bin_exact_ref").as[StreamOps.KnnMatch].collect()
        .groupBy(_.qid).view
        .mapValues(_.sortBy(_.rank).map(m => (m.vec_id, m.dist)).toSeq)
        .toMap.toMap
    } finally q.stop()
    assert(run("bin_full", index.length, Seq(20)) == want)
  }

  test("narrow shortlist equals the driver two-stage replay, any batching") {
    def pack(v: Array[Long]): (Long, Long) = {
      var w0 = 0L; var w1 = 0L
      v.indices.foreach { i =>
        if (v(i) > 0) { if (i < 32) w0 |= 1L << i else w1 |= 1L << (i - 32) }
      }
      (w0, w1)
    }
    val want = queries.map { qe =>
      val (qw0, qw1) = pack(qe.qv)
      val short = index.map { case (id, v) =>
        val (w0, w1) = pack(v)
        ((java.lang.Long.bitCount(w0 ^ qw0)
          + java.lang.Long.bitCount(w1 ^ qw1)).toLong, id, v)
      }.sortBy(t => (t._1, t._2)).take(16)
      val top = short.map { case (_, id, v) =>
        (v.zip(qe.qv).map { case (a, b) => (a - b) * (a - b) }.sum, id)
      }.sorted.take(5).map { case (d, id) => (id, d) }.toSeq
      qe.qid -> top
    }.toMap
    assert(run("bin_one", 16, Seq(20)) == want)
    assert(run("bin_many", 16, Seq(3, 7, 5)) == want)
  }

  test("guards: ragged index, dim > 64, shortlist < k, dim sentinel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = new java.sql.Timestamp(1_436_918_400_000L)
    val ragged = Array((0L, Array.fill(8)(1L)), (1L, Array.fill(9)(1L)))
    assertThrows[IllegalArgumentException] {
      StreamOps.binaryAnnStream(
        MemoryStream[StreamOps.VecEvent].toDS(), ragged, 8, 3)
    }
    val wide = Array((0L, Array.fill(65)(1L)))
    assertThrows[IllegalArgumentException] {
      StreamOps.binaryAnnStream(
        MemoryStream[StreamOps.VecEvent].toDS(), wide, 8, 3)
    }
    assertThrows[IllegalArgumentException] {
      StreamOps.binaryAnnStream(
        MemoryStream[StreamOps.VecEvent].toDS(),
        Array((0L, Array.fill(8)(1L))), 2, 3)
    }
    val in = MemoryStream[StreamOps.VecEvent]
    val q = StreamOps.toMemory(
      StreamOps.binaryAnnStream(in.toDS(),
        Array.tabulate(10)(i => (i.toLong, Array.fill(8)(i * 10L))), 8, 3)
        .toDF(), "bin_dim", OutputMode.Append)
    try {
      in.addData(StreamOps.VecEvent(2L, t, Array.fill(5)(0L)))
      q.processAllAvailable()
      val got = spark.table("bin_dim").as[StreamOps.KnnMatch].collect().toSeq
      assert(got == Seq(StreamOps.KnnMatch(2L, -1, -1L, -1L)))
    } finally q.stop()
  }
}
