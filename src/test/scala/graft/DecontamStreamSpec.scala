package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{DecontamVerdict, DocEvent}

/** decontamStream: the streamed contaminated-flag set must equal batch
  * q82's per-doc verdicts on the same eval digest (doc_id % 97 = 0
  * split) — under any batching and any delivery order (stateless), with
  * the digest hashes proven equal to the SQL-side md5-prefix identity.
  */
class DecontamStreamSpec extends SparkSpec {

  /** The fixture's eval digest: distinct 8-gram 60-bit hashes of the
    * doc_id % 97 = 0 docs, computed through the SQL expression so the
    * spec also pins gramHash60 == the engine's md5-prefix device.
    */
  private def evalDigest: Set[Long] = {
    import spark.implicits._
    Tables(spark, sfDir, "documents").filter($"doc_id" % 97 === 0)
      .withColumn("toks", split($"text", "\\s+"))
      .filter(size($"toks") >= 8)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 7), " +
          "i -> conv(substring(md5(array_join(slice(toks, i, 8), ' ')), " +
          "1, 15), 16, 10))")).as("h"))
      .select($"h".cast("long")).distinct().as[Long].collect().toSet
  }

  /** Batch reference: train docs (doc_id % 97 != 0) with any eval gram. */
  private def batchContaminated: Set[Long] = {
    import spark.implicits._
    val grams = Tables(spark, sfDir, "documents")
      .withColumn("toks", split($"text", "\\s+"))
      .withColumn("ngs",
        when(size($"toks") < 8, array().cast("array<string>"))
          .otherwise(expr("transform(sequence(1, size(toks) - 7), " +
            "i -> array_join(slice(toks, i, 8), ' '))")))
    val ev = grams.filter($"doc_id" % 97 === 0)
      .select(explode($"ngs").as("ng")).distinct()
    grams.filter($"doc_id" % 97 =!= 0)
      .select($"doc_id", explode($"ngs").as("ng"))
      .join(broadcast(ev), "ng")
      .select($"doc_id").distinct().as[Long].collect().toSet
  }

  private def trainDocs: Seq[DocEvent] = {
    import spark.implicits._
    Tables(spark, sfDir, "documents").filter($"doc_id" % 97 =!= 0)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => DocEvent(id, new Timestamp(id), t) }.toSeq
  }

  private def run(batches: Seq[Seq[DocEvent]],
      name: String): Seq[DecontamVerdict] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DocEvent]
    val q = StreamOps.toMemory(
      StreamOps.decontamStream(in.toDS(), evalDigest).toDF(),
      name, OutputMode.Append)
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(name).as[DecontamVerdict].collect().toSeq
    } finally q.stop()
  }

  test("streamed verdicts equal batch q82 flags, any batching/order") {
    val want = batchContaminated
    val docs = trainDocs
    assert(want.nonEmpty, "fixture has no contaminated train docs")
    val got = run(docs.grouped(37).toSeq, "decontam_37")
    assert(got.map(_.doc_id).toSet === docs.map(_.doc_id).toSet)
    assert(got.filter(_.contaminated).map(_.doc_id).toSet === want)
    // stateless: a scrambled single batch produces identical verdicts
    val scrambled = run(
      Seq(new scala.util.Random(3).shuffle(docs)), "decontam_scram")
    assert(scrambled.toSet === got.toSet)
    // flag consistency and window accounting
    got.foreach { v =>
      assert(v.contaminated === (v.n_hits > 0))
      assert(v.n_hits <= v.n_grams)
    }
  }
}
