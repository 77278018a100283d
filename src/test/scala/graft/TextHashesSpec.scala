package graft

import graft.functions.TextHashes
import graft.operators.TextOps

/** Value-level verification for the non-SQL-expressible dedup operators
  * (MinHash/LSH, SimHash, winnowing, langid) — the driver gate only
  * rows-checks these, so the real assertions live here.
  */
class TextHashesSpec extends SparkSpec {

  private val rnd = new scala.util.Random(7)
  private def randDoc(n: Int): Seq[String] =
    Seq.fill(n)("w" + rnd.nextInt(1000))

  test("minhash: ArrayData fast path matches the reference implementation") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val tokens = Seq("alpha", "beta", "gamma", "beta", "δέλτα", "")
    val arr = new GenericArrayData(tokens.map(UTF8String.fromString).toArray[Any])
    val fast = TextHashes.minhashSigFromArrayData(arr, 32, 1)
    assert(fast.toLongArray().toSeq == TextHashes.minhashSigScala(tokens, 32, 1).toSeq)
    val fastMd5 = TextHashes.md5MinhashSigFromArrayData(arr, 16)
    assert(fastMd5.toLongArray().toSeq == TextHashes.md5MinhashSigScala(tokens, 16).toSeq)
    // the pre-hashed variant (q61's one-md5-pass path) must agree with
    // the from-strings reference when fed the 60-bit md5 prefixes
    val md = java.security.MessageDigest.getInstance("MD5")
    val h60 = tokens.distinct.map { t =>
      val dig = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ((0 until 8).foldLeft(0L)((h, b) => (h << 8) | (dig(b) & 0xffL))) >>> 4
    }
    val fromHashes = TextHashes.minhashFromHashesArrayData(
      new GenericArrayData(h60.toArray), 16)
    assert(fromHashes.toLongArray().toSeq == fastMd5.toLongArray().toSeq)
  }

  test("md5_window_prefixes equals the SQL transform/slice/md5 form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sfDir, "documents")
      .withColumn("toks", split($"text", "\\s+"))
    val both = docs.select(
      graft.functions.TextHashes.md5WindowPrefixes($"toks", 8).as("fast"),
      when(size($"toks") < 8, expr("CAST(array() AS array<string>)"))
        .otherwise(expr(
          "transform(sequence(1, size(toks) - 7), " +
            "i -> substring(md5(array_join(slice(toks, i, 8), ' ')), 1, 16))"))
        .as("sql"))
    assert(both.filter($"fast" =!= $"sql").count() == 0)
    // short docs emit the empty array, not null
    assert(Seq(Seq("a", "b")).toDF("toks")
      .select(graft.functions.TextHashes.md5WindowPrefixes($"toks", 8).as("w"))
      .head.getSeq[String](0).isEmpty)
  }

  test("sorted_intersect_size equals array_intersect size on sorted sets") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(20).toString).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(20).toString).distinct.sorted
      def ad(x: Seq[String]) =
        new GenericArrayData(x.map(UTF8String.fromString).toArray[Any])
      val got = TextHashes.sortedIntersectSizeFromArrayData(ad(a), ad(b))
      assert(got == a.toSet.intersect(b.toSet).size.toLong, s"a=$a b=$b")
    }
  }

  test("minhash: identical docs → identical signatures") {
    val d = randDoc(80)
    assert(TextHashes.minhashSigScala(d, 32, 1).toSeq ==
      TextHashes.minhashSigScala(d, 32, 1).toSeq)
  }

  test("minhash: signature similarity estimates Jaccard") {
    val a = randDoc(200).distinct
    // 90% overlap near-dup
    val b = a.take((a.length * 0.9).toInt) ++ Seq.fill(a.length / 10)("x" + rnd.nextInt(1000))
    val c = randDoc(200).distinct // unrelated
    def est(x: Seq[String], y: Seq[String]): Double = {
      val (sx, sy) = (TextHashes.minhashSigScala(x, 128, 1),
        TextHashes.minhashSigScala(y, 128, 1))
      sx.zip(sy).count { case (p, q) => p == q } / 128.0
    }
    def jac(x: Seq[String], y: Seq[String]): Double = {
      val (s1, s2) = (x.toSet, y.toSet)
      s1.intersect(s2).size.toDouble / s1.union(s2).size
    }
    assert(math.abs(est(a, b) - jac(a, b)) < 0.15, "near-dup estimate off")
    assert(math.abs(est(a, c) - jac(a, c)) < 0.15, "unrelated estimate off")
    assert(est(a, b) > est(a, c), "ordering must hold")
  }

  test("simhash: hamming distance tracks similarity") {
    val a = randDoc(300)
    val b = a.updated(0, "CHANGED").updated(5, "ALSO")
    val c = randDoc(300)
    val (ha, hb, hc) = (TextHashes.simhash64Scala(a),
      TextHashes.simhash64Scala(b), TextHashes.simhash64Scala(c))
    assert(TextHashes.hamming64(ha, ha) == 0)
    assert(TextHashes.hamming64(ha, hb) < TextHashes.hamming64(ha, hc),
      "near-dup must be closer than unrelated")
    assert(TextHashes.hamming64(ha, hc) > 10, "unrelated should be far")
  }

  test("winnow: shared runs produce shared fingerprints") {
    val shared = randDoc(60)
    val a = randDoc(30) ++ shared ++ randDoc(30)
    val b = randDoc(25) ++ shared ++ randDoc(35)
    val c = randDoc(120)
    val (fa, fb, fc) = (TextHashes.winnowScala(a, 4).toSet,
      TextHashes.winnowScala(b, 4).toSet, TextHashes.winnowScala(c, 4).toSet)
    val overlapNear = fa.intersect(fb).size.toDouble / fa.union(fb).size
    val overlapFar = fa.intersect(fc).size.toDouble / fa.union(fc).size
    assert(overlapNear > overlapFar, "shared-run docs must share more fingerprints")
    assert(overlapNear > 0.2)
  }

  test("LSH candidates are a subset of exact pairs with high recall") {
    // q33 re-checks candidates with exact Jaccard > 0.8, so precision
    // vs q32 (exhaustive exact > 0.8 on the same subset) must be 1.0;
    // banding (8 bands x 4 rows) should recall most pairs above 0.8.
    val exact = operators.TextOps.defs("q32_ngram_jaccard")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = operators.TextOps.defs("q33_minhash_lsh_pairs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH produced non-exact pairs: ${lsh -- exact}")
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      assert(recall > 0.6, s"LSH recall too low: $recall")
    }
  }

  test("langid is deterministic and votes by stopwords") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog of a house is big", "en"),
      (2L, "der hund und die katze ist ein tier", "de"),
      (3L, "el perro y la casa es un lugar", "es"),
      (4L, "le chien et la maison est un lieu", "fr")
    ).toDF("doc_id", "text", "lang")
    df.createOrReplaceTempView("documents_synthetic")
    // reuse the operator logic by writing the synthetic docs to a temp dir
    val tmp = java.nio.file.Files.createTempDirectory("graft_langid").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextOps.defs("q35_langid")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr"), out.toString)
  }

  test("tokenHash pins the murmur32 values the DuckDB oracle macros replay") {
    // DuckMacros.M32 (the q33/q34/q36 oracle) was validated bit-for-bit
    // against exactly these values — if tokenHash ever changes (seed,
    // algorithm, charset), this must break loudly alongside the oracle.
    val gt = Map(
      ("", 0x9747b28c) -> 3954623016L, ("a", 0x9747b28c) -> 2141232806L,
      ("abc", 0x9747b28c) -> 3360318173L, ("abcde", 0x9747b28c) -> 3910514738L,
      ("the", 0x9747b28c) -> 4162928886L, ("日本語", 0x9747b28c) -> 2170758261L,
      ("abcd", 0x85ebca6b) -> 457003281L, ("日本語", 0x85ebca6b) -> 3776377064L,
      ("abcde", 0x1b873593) -> 840040391L, ("naïve", 0x1b873593) -> 361750328L)
    gt.foreach { case ((s, seed), v) =>
      assert((TextHashes.tokenHash(s, seed) & 0xffffffffL) == v,
        s"murmur32('$s', $seed) drifted from the oracle-validated value")
    }
  }

  test("q98 feature hashing: l1 equals token count, nnz bounded by 64") {
    import spark.implicits._
    val out = TextOps.defs("q98_feature_hashing")(spark, sfDir)
      .select($"doc_id", $"l1", $"nnz").as[(Long, Long, Long)].collect()
    import org.apache.spark.sql.functions.{size, split}
    val tokCounts = graft.Tables(spark, sfDir, "documents")
      .select($"doc_id", size(split($"text", "\\s+")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    out.foreach { case (id, l1, nnz) =>
      assert(l1 == tokCounts(id), s"doc $id: l1 $l1 != ${tokCounts(id)}")
      assert(nnz >= 1 && nnz <= 64)
    }
    assert(out.length == tokCounts.size)
  }

  test("bpeishCount equals regexp_count on corpus text and adversarial strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // corpus: every document must agree with the regex formulation
    val diff = Tables(spark, sfDir, "documents")
      .select(
        graft.functions.TextHashes.bpeishCountCol($"text").as("scan"),
        regexp_count($"text", lit("[a-z]+|[0-9]|[^a-z0-9 ]")).cast("long").as("re"))
      .filter($"scan" =!= $"re").count()
    assert(diff == 0, s"$diff documents diverge from the regex")
    // adversarial: runs, digits, punctuation, unicode, empties, spaces
    val cases = Seq("", " ", "abc", "a b c", "a1b2", "123", "!!", "a!1 b",
      "ABC abc", "héllo wörld", "\u00e9\u00e9", "a  b", "zz9zz", "\ud83d\ude00 a")
    val got = cases.toDF("t")
      .select(
        graft.functions.TextHashes.bpeishCountCol($"t").as("scan"),
        regexp_count($"t", lit("[a-z]+|[0-9]|[^a-z0-9 ]")).cast("long").as("re"))
      .collect()
    cases.zip(got).foreach { case (c, r) =>
      assert(r.getLong(0) == r.getLong(1), s"mismatch on <$c>: $r")
    }
  }
}
