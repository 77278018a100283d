package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamOps

/** The streaming deterministic reservoir (q166's online form): applying
  * the emitted admit/evict CDC must reconstruct, at every batch
  * boundary, exactly the batch-computed k-smallest-hash sample of the
  * corpus prefix — under ordered, scrambled, and re-batched delivery
  * (min-k is a semilattice, so the CONTENTS are order-invariant even
  * though the delta sequence is batch-granular).
  */
class ReservoirStreamSpec extends SparkSpec {

  private val K = 4

  private def md5Long(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    // first 15 hex digits == 60 bits: drop the low nibble of byte 7
    val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  private def docs(): Seq[StreamOps.ResDoc] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"lang").as[(Long, String)].collect()
      .map { case (id, l) => StreamOps.ResDoc(id, l) }.toSeq
  }

  private def bruteForce(prefix: Seq[StreamOps.ResDoc])
      : Map[String, Set[(Long, Long)]] =
    prefix.groupBy(_.lang).map { case (l, ds) =>
      l -> ds.map(d => (md5Long(d.doc_id), d.doc_id)).distinct
        .sorted.take(K).toSet
    }

  private val runIdx = new java.util.concurrent.atomic.AtomicInteger(0)

  private def run(batches: Seq[Seq[StreamOps.ResDoc]])
      : Seq[Map[String, Set[(Long, Long)]]] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val name = s"res_out_${runIdx.incrementAndGet()}"
    val in = MemoryStream[StreamOps.ResDoc]
    val q = StreamOps.reservoirStream(in.toDS(), K)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val sample = scala.collection.mutable.Map[String,
      Set[(Long, Long)]]().withDefaultValue(Set.empty)
    val states = scala.collection.mutable.ArrayBuffer[
      Map[String, Set[(Long, Long)]]]()
    var consumed = 0L
    try {
      batches.foreach { b =>
        in.addData(b)
        q.processAllAvailable()
        val deltas = spark.sql(
          s"SELECT lang, doc_id, h, op FROM $name")
          .as[(String, Long, Long, String)].collect()
        deltas.drop(consumed.toInt).foreach { case (l, id, h, op) =>
          if (op == "admit") sample(l) = sample(l) + ((h, id))
          else sample(l) = sample(l) - ((h, id))
        }
        consumed = deltas.length.toLong
        states += sample.toMap
      }
    } finally q.stop()
    states.toSeq
  }

  test("applied deltas reconstruct the batch sample at every boundary") {
    val all = docs()
    val batches = all.grouped(math.max(1, all.size / 4)).toSeq
    val states = run(batches)
    var prefix = Seq.empty[StreamOps.ResDoc]
    batches.zip(states).foreach { case (b, got) =>
      prefix = prefix ++ b
      val want = bruteForce(prefix)
      assert(got.filter(_._2.nonEmpty) === want,
        s"reservoir diverged after ${prefix.size} docs")
      got.values.foreach(sam => assert(sam.size <= K))
    }
  }

  test("final contents are delivery-order and re-batching invariant, replays no-ops") {
    val all = docs()
    val want = bruteForce(all)
    val scrambled = all.sortBy(d => md5Long(d.doc_id * 31 + 7))
    val replayTail = scrambled.takeRight(50)
    val variants = Seq(
      all.grouped(200).toSeq,
      scrambled.grouped(57).toSeq,
      scrambled.grouped(500).toSeq :+ replayTail) // at-least-once tail
    variants.foreach { batches =>
      val end = run(batches).last.filter(_._2.nonEmpty)
      assert(end === want, "contents depended on delivery order/batching")
    }
  }
}
