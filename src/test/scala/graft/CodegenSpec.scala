package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextHashes, VectorHashes}

/** The custom expressions must generate COMPILABLE code — Spark silently
  * falls back to interpreted eval when codegen fails, so these run with
  * the fallback disabled and whole-stage forced on.
  */
class CodegenSpec extends SparkSpec {

  private def withStrictCodegen[T](f: => T): T = {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try f finally {
      spark.conf.set("spark.sql.codegen.fallback", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("text-hash expressions compile under strict codegen") {
    import spark.implicits._
    withStrictCodegen {
      val out = Tables(spark, sfDir, "documents")
        .withColumn("toks", split($"text", "\\s+"))
        .select($"doc_id",
          TextHashes.simhash64($"toks").as("sh"),
          TextHashes.minhashSig($"toks", 16, 1).as("mh"),
          TextHashes.winnowFingerprints($"toks", 4).as("fp"))
        .collect()
      assert(out.length == Tables(spark, sfDir, "documents").count())
      assert(out.forall(_.getSeq[Long](2).length == 16))
    }
  }

  test("md5-family and merge-intersect expressions compile under strict codegen") {
    import spark.implicits._
    withStrictCodegen {
      val out = Tables(spark, sfDir, "documents")
        .withColumn("toks", split($"text", "\\s+"))
        .withColumn("set", array_sort(array_distinct($"toks")))
        .select($"doc_id",
          TextHashes.md5MinhashSig($"set", 16).as("mh"),
          TextHashes.md5Simhash64($"toks").as("sh"),
          TextHashes.md5Winnow($"toks", 4).as("fp"),
          TextHashes.sortedIntersectSize($"set", $"set").as("self_inter"),
          size($"set").as("sz"))
        .collect()
      assert(out.nonEmpty)
      assert(out.forall(_.getSeq[Long](1).length == 16))
      // self-intersection of a set is its size — cheap end-to-end sanity
      assert(out.forall(r => r.getLong(4) == r.getInt(5).toLong))
    }
  }

  test("vector-math expressions compile under strict codegen and match the HOF fold") {
    import spark.implicits._
    import graft.functions.VectorMath
    withStrictCodegen {
      val e = Tables(spark, sfDir, "embeddings")
        .withColumn("v", transform($"embedding", x => x.cast("double")))
        .withColumn("qv", expr(
          "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000d + 0.5d) AS BIGINT))"))
        .withColumn("rv", reverse($"qv"))
        .withColumn("rw", reverse($"v"))
      // bit-identical to the interpreted higher-order-function formulation
      // (same left-to-right fold; multiply-round then add-round, no FMA)
      val rows = e.select(
        VectorMath.sqDistLong($"qv", $"rv").as("sd"),
        expr("aggregate(zip_with(qv, rv, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)").as("sd_hof"),
        VectorMath.dotDouble($"v", $"rw").as("dp"),
        expr("aggregate(zip_with(v, rw, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)").as("dp_hof"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getLong(0) == r.getLong(1))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(3)), "dot must be bit-identical")
      }
      // self-distance is zero; self-dot is the squared norm (>= 0)
      val self = e.select(VectorMath.sqDistLong($"qv", $"qv"),
        VectorMath.dotDouble($"v", $"v")).collect()
      assert(self.forall(r => r.getLong(0) == 0L && r.getDouble(1) >= 0.0))
      // PQ encode + ADC: codes address a literal codebook built from
      // the first vectors; encoding then summing the 8 LUT entries of
      // a vector's OWN code must reproduce its per-subspace distances
      val cbRows = e.filter($"vec_id" < 16)
        .orderBy($"vec_id").select($"qv").as[Seq[Long]].collect()
      val cbc = array((0 until 8).map(m => array(cbRows.map(v =>
        array(v.slice(m * 8, m * 8 + 8).map(lit): _*)): _*)): _*)
      val pq = e.select($"vec_id", $"qv",
        VectorMath.pqEncode($"qv", cbc).as("code"))
        .withColumn("lut", array((0 until 8).map(m =>
          transform(element_at(cbc, m + 1), cv =>
            VectorMath.sqDistLong(slice($"qv", m * 8 + 1, 8), cv))): _*))
        .select($"vec_id", $"code", VectorMath.pqAdc($"lut", $"code").as("adc"))
        .collect()
      assert(pq.nonEmpty)
      // a codebook seed's own code addresses itself in every subspace
      // (distance 0), so its ADC self-distance is exactly zero
      pq.filter(_.getLong(0) < 16).foreach(r =>
        assert(r.getLong(2) == 0L, s"seed ${r.getLong(0)} adc ${r.getLong(2)}"))
      assert(pq.forall(_.getLong(2) >= 0L))
      // the fused residual LUT equals the HOF formulation cell-by-cell
      // (lut[m][c] = || (qv - cq) - cb[m][c] ||², cq = first vector)
      val cq0 = array(cbRows.head.map(lit): _*)
      val lutPair = e.limit(50).select(
        VectorMath.pqLut($"qv", cq0, cbc).as("fused"),
        array((0 until 8).map(m =>
          transform(element_at(cbc, m + 1), cv =>
            VectorMath.sqDistLong(
              slice(zip_with($"qv", cq0, (a, b) => a - b),
                m * 8 + 1, 8), cv))): _*).as("hof"))
        .as[(Seq[Seq[Long]], Seq[Seq[Long]])].collect()
      assert(lutPair.nonEmpty)
      lutPair.foreach { case (f, h) => assert(f === h) }
    }
  }

  test("hyperplane bucket compiles under strict codegen for both types") {
    import spark.implicits._
    withStrictCodegen {
      val f = Tables(spark, sfDir, "embeddings")
        .select(VectorHashes.hyperplaneBucket($"embedding", 4).as("b"))
        .collect().map(_.getLong(0))
      assert(f.forall(b => b >= 0 && b < 16))
      val d = Tables(spark, sfDir, "embeddings")
        .withColumn("v", transform($"embedding", x => x.cast("double")))
        .select(VectorHashes.hyperplaneBucket($"v", 4).as("b"))
        .collect().map(_.getLong(0))
      assert(f.toSeq == d.toSeq, "float and double paths must agree")
    }
  }
}
