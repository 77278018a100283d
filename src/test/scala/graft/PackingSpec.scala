package graft

import org.apache.spark.sql.functions._

/** q176 sequence packing: exact manifest on a constructed shard with
  * known boundary crossings (incl. a NULL-text doc), and the loader
  * invariants on the driver fixture — contiguous offsets per source,
  * split counts consistent with the capacity arithmetic.
  */
class PackingSpec extends SparkSpec {

  private val C = 512L

  test("constructed shard packs with exact offsets and boundary splits") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pack").toString
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // source a: 500 tokens, then 20 (occupies 500..519 — crosses the
    // 512 boundary once), a NULL doc at offset 520 (zero tokens, lands
    // in sequence 1), then 1030 (occupies 520..1549 — crosses 1024 and
    // 1536); source b restarts at offset 0
    Seq(
      (1L, "x", "a", Option(words(500))),
      (2L, "x", "a", Option(words(20))),
      (3L, "x", "a", Option.empty[String]),
      (4L, "x", "a", Option(words(1030))),
      (5L, "x", "b", Option(words(7)))
    ).toDF("doc_id", "lang", "source", "text")
      .withColumn("n_chars", coalesce(length($"text").cast("long"), lit(0L)))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q176_sequence_packing")(spark, dir)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "a", 500L, 0L, 0L, 0L),
      (2L, "a", 20L, 500L, 0L, 1L),
      (3L, "a", 0L, 520L, 1L, 0L),
      (4L, "a", 1030L, 520L, 1L, 2L),
      (5L, "b", 7L, 0L, 0L, 0L)))
  }

  test("fixture manifest satisfies the loader invariants") {
    import spark.implicits._
    val got = SparkEntry.queries("q176_sequence_packing")(spark, sfDir)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    got.groupBy(_._2).values.foreach { docs =>
      val inOrder = docs.sortBy(_._1)
      // offsets are contiguous: each doc starts where the previous ended
      inOrder.zip(inOrder.tail).foreach { case (a, b) =>
        assert(b._4 === a._4 + a._3)
      }
      inOrder.foreach { case (_, _, nTok, off, seqFirst, nSplits) =>
        assert(seqFirst === off / C)
        assert(nSplits === (off + math.max(nTok, 1L) - 1) / C - off / C)
        assert(nSplits >= 0L)
      }
    }
    assert(got.exists(_._6 > 0L), "fixture should have boundary crossings")
  }
}
