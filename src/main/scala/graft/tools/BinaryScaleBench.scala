package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{BinaryStore, Scratch, VectorOps}

/** Stored-index scale A/B for the 1-bit serving tier (round-13 task):
  * at a STORED index big enough for scan bandwidth to matter (the toy
  * 2048-entry StreamBench index hides it), serve the same query batch
  *
  *   (a) from the full-precision vectors relation (the "raw store"
  *       serve: one exact-L2 scan folding map-side to top-5/query),
  *   (b) from the binary tier, two-stage, uncached (manifest read +
  *       codes scan + checkpointed shortlist + bucket-pruned refine),
  *   (c) from the binary tier's CACHED serving path (epoch-keyed
  *       relations pinned, shortlist+refine fused into one job) —
  *       the steady-state of binaryStoreServeStream's trigger loop.
  *
  * Prints one JSON line with min-of-reps seconds per mode. The claim
  * under test: past ~100k codes the 16-byte tier beats the 256-byte
  * scan per query batch, and the cached fused path beats both.
  *
  * Usage: runMain graft.tools.BinaryScaleBench <sfDir> [nQueries] [reps]
  */
object BinaryScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val nq = args.lift(1).map(_.toInt).getOrElse(64)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val dir = Scratch.dir(spark, "binscale")
    val emb = VectorOps.quantized(spark, sfDir)
    BinaryStore.build(emb, dir)
    spark.conf.set("spark.graft.index.retainEpochs", "2")
    val nCodes = spark.read.parquet(s"$dir/codes").count()
    val queries = VectorOps.binaryCodes(
        emb.filter($"vec_id" % 100 === 0).limit(nq))
      .select($"vec_id".as("query_id"), $"qv".as("q_qv"),
        $"w0".as("qw0"), $"w1".as("qw1"))
      .localCheckpoint(true)
    val nQueries = queries.count()

    def time(body: => DataFrame): Double = {
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def minOf(label: String)(body: => DataFrame): Double = {
      val vs = (1 to reps).map(_ => time(body))
      Console.err.println(
        f"[BinaryScaleBench] $label: ${vs.map(v => f"$v%.2f").mkString(" ")}")
      vs.min
    }

    // (a) raw store: exact L2 over the stored full-precision relation,
    // folding map-side to 5 rows/query (the q37/exactTop plan shape)
    val vecs = spark.read.parquet(s"$dir/vectors")
    val exact = minOf("exact_scan") {
      vecs.crossJoin(broadcast(queries.select($"query_id", $"q_qv")))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor"),
          graft.functions.VectorMath.sqDistLong($"qv", $"q_qv").as("dist"))
        .groupBy($"query_id")
        .agg(graft.functions.BoundedAggs.topScored(
          -$"dist".cast("double"), $"neighbor", lit(true), 5).as("top"))
        .select($"query_id", posexplode($"top"))
    }
    // (b) binary two-stage, uncached
    val binU = minOf("binary_serve") {
      BinaryStore.serve(spark, dir, queries, k = 5, width = 64)
    }
    // (c) cached fused path — one warm call to populate, then measure
    BinaryStore.serve(spark, dir, queries, k = 5, width = 64,
      cached = true).write.format("noop").mode("overwrite").save()
    val binC = minOf("binary_serve_cached") {
      BinaryStore.serve(spark, dir, queries, k = 5, width = 64,
        cached = true)
    }
    println(f"""{"tool":"BinaryScaleBench","n_codes":$nCodes,"n_queries":$nQueries,"reps":$reps,"exact_scan_sec":$exact%.3f,"binary_serve_sec":$binU%.3f,"binary_serve_cached_sec":$binC%.3f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
