package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** q148 (split-leakage audit) and q150 (Zipf profile) against driver-side
  * recomputes on the sf0.001 corpus.
  */
class SplitZipfSpec extends SparkSpec {

  private def md5Bucket(docId: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(docId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 100
  }

  private def partOf(docId: Long): String = {
    val b = md5Bucket(docId)
    if (b < 90) "train" else if (b < 95) "val" else "test"
  }

  test("q148 matrix equals the q61 pair list classified driver-side") {
    import spark.implicits._
    // q61's J > 0.8 LSH pair relation is the verified primitive; the
    // audit must be exactly that relation bucketed by the hash split
    val pairs = TextOps.defs("q61_minhash_md5")(spark, sfDir)
      .select($"id1".as[Long], $"id2".as[Long]).collect().toSeq
    val sliceIds = Tables(spark, sfDir, "documents")
      .filter($"doc_id" % 5 === 0).select($"doc_id".as[Long]).collect().toSeq
    val rank = Map("train" -> 0, "val" -> 1, "test" -> 2)
    val sizes = sliceIds.groupBy(partOf).map { case (p, xs) => p -> xs.size.toLong }
      .withDefaultValue(0L)
    val counts = pairs.map { case (a, b) =>
      val (pa, pb) = (partOf(a), partOf(b))
      if (rank(pa) <= rank(pb)) (pa, pb) else (pb, pa)
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      .withDefaultValue(0L)
    val combos = Seq(("train", "train"), ("train", "val"), ("train", "test"),
      ("val", "val"), ("val", "test"), ("test", "test"))
    val expected = combos.map { case (a, b) =>
      (a, b, sizes(a), sizes(b), counts((a, b)), a != b)
    }
    val got = TextOps.defs("q148_split_leakage")(spark, sfDir)
      .as[(String, String, Long, Long, Long, Boolean)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._5).sum == pairs.size.toLong, "every pair classified once")
  }

  test("q150 profile equals a driver-side Zipf recompute") {
    import spark.implicits._
    val rows = Tables(spark, sfDir, "documents")
      .select($"source".as[String], $"text".as[String]).collect().toSeq
    def bits(x: Long) = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val expected = rows.groupBy(_._1).toSeq.map { case (src, docs) =>
      val counts = docs.flatMap(_._2.split("\\s+"))
        .groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }.toSeq
      val ranked = counts.sortBy { case (t, c) => (-c, t) }.map(_._2)
      def bAt(r: Int) = if (ranked.size >= r) bits(ranked(r - 1)) else -1L
      val (b1, b4, b16, b64, b256) = (bAt(1), bAt(4), bAt(16), bAt(64), bAt(256))
      val slope =
        if (b256 >= 0) 1000 * (b1 - b256) / 8
        else if (b64 >= 0) 1000 * (b1 - b64) / 6
        else if (b16 >= 0) 1000 * (b1 - b16) / 4
        else if (b4 >= 0) 1000 * (b1 - b4) / 2
        else 0L
      (src, counts.size.toLong, counts.map(_._2).sum,
        b1, b4, b16, b64, b256, slope)
    }.sortBy(_._1)
    val got = TextOps.defs("q150_zipf_profile")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == expected)
  }
}
