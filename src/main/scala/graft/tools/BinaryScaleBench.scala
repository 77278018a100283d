package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{BinaryStore, IvfBinaryStore, IvfIndex, Scratch,
  VectorOps}

/** Stored-index scale A/B for the 1-bit serving tier, extended
  * (round 14) with the COMPOSED tier and a COLD-IO mode:
  *
  *   (a) exact_scan — full-precision L2 over the stored vectors
  *       relation, folding map-side to top-5/query,
  *   (b) binary_serve — flat 1-bit two-stage, uncached,
  *   (c) binary_serve_cached — epoch-keyed pinned relations, fused
  *       serve (skipped in cold mode: pinning defeats the point),
  *   (d) ivf_serve — the uncompressed IVF store (probes=4 of 16),
  *   (e) ivfbin_serve — the IVF-routed binary tier (nprobe=4,
  *       width=64): route coarse, Hamming-scan ONLY probed cells,
  *       exact-refine the shortlist.
  *
  * Each ANN mode also reports recall@5 vs the exact scan, so the
  * wall-clock comparison is AT MEASURED RECALL, not free-floating.
  *
  * Cold mode (`cold` arg): `sync; echo 3 > /proc/sys/vm/drop_caches`
  * before every timed rep — the byte-bound claim's real regime (the
  * round-13 honest negative: on page-cached local data the 16× scan-
  * byte cut does not convert to wall; this mode measures whether it
  * converts when bytes actually move).
  *
  * `copies` unions key-offset copies of the embeddings table before
  * the builds (queries drawn from copy 0), so a ≥1M-code store can be
  * driven from sf0.1 without materializing a full big-sf dataset.
  *
  * Usage: runMain graft.tools.BinaryScaleBench
  *          <sfDir> [nQueries] [reps] [copies] [cold]
  */
object BinaryScaleBench {

  private val Off = 100_000_000L

  private def dropCaches(): Unit = {
    val p = new ProcessBuilder("sh", "-c",
      "sync; echo 3 > /proc/sys/vm/drop_caches").inheritIO().start()
    if (p.waitFor() != 0)
      Console.err.println("[BinaryScaleBench] drop_caches failed — " +
        "cold reps are NOT cold")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val nq = args.lift(1).map(_.toInt).getOrElse(64)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val copies = args.lift(3).map(_.toInt).getOrElse(1)
    val cold = args.lift(4).contains("cold")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val dir = Scratch.dir(spark, "binscale")
    val ivfDir = Scratch.dir(spark, "binscale_ivf")
    val ivfBinDir = Scratch.dir(spark, "binscale_ivfbin")
    val emb0 = VectorOps.quantized(spark, sfDir)
    val emb =
      if (copies <= 1) emb0
      else (0 until copies).map(i => emb0.select(
          ($"vec_id" + lit(i * Off)).as("vec_id"), $"qv"))
        .reduce(_ unionByName _)
    BinaryStore.build(emb, dir)
    IvfIndex.build(emb, ivfDir)
    IvfBinaryStore.build(emb, ivfBinDir)
    spark.conf.set("spark.graft.index.retainEpochs", "2")
    val nCodes = spark.read.parquet(s"$dir/codes").count()
    val queries = VectorOps.binaryCodes(
        emb0.filter($"vec_id" % 100 === 0).limit(nq))
      .select($"vec_id".as("query_id"), $"qv".as("q_qv"),
        $"w0".as("qw0"), $"w1".as("qw1"))
      .localCheckpoint(true)
    val nQueries = queries.count()

    def time(body: => DataFrame): Double = {
      if (cold) dropCaches()
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

    // (a) raw store: exact L2 over the stored full-precision relation
    val vecs = spark.read.parquet(s"$dir/vectors")
    def exactDf: DataFrame =
      vecs.crossJoin(broadcast(queries.select($"query_id", $"q_qv")))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor"),
          graft.functions.VectorMath.sqDistLong($"qv", $"q_qv").as("dist"))
        .groupBy($"query_id")
        .agg(graft.functions.BoundedAggs.topScored(
          -$"dist".cast("double"), $"neighbor", lit(true), 5).as("top"))
        .select($"query_id", posexplode($"top"))
        .select($"query_id", $"col.id".as("neighbor"))
    val exact = minOf("exact_scan")(exactDf)
    // ground truth for the recall columns (computed once, untimed)
    val truth: Map[Long, Set[Long]] = exactDf
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }

    def recall(df: DataFrame): Long = {
      val got = df.select($"query_id", $"neighbor")
        .as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
      val k = truth.values.map(_.size).sum
      val hit = truth.map { case (q, t) =>
        (t intersect got.getOrElse(q, Set.empty)).size }.sum
      if (k == 0) -1L else hit * 1000L / k
    }

    // (b) binary two-stage, uncached
    def binDf: DataFrame =
      BinaryStore.serve(spark, dir, queries, k = 5, width = 64)
    val binU = minOf("binary_serve")(binDf)
    val recBin = recall(binDf)
    // (c) cached fused path — one warm call to populate, then measure
    val binC =
      if (cold) -1.0
      else {
        BinaryStore.serve(spark, dir, queries, k = 5, width = 64,
          cached = true).write.format("noop").mode("overwrite").save()
        minOf("binary_serve_cached") {
          BinaryStore.serve(spark, dir, queries, k = 5, width = 64,
            cached = true)
        }
      }
    // (d) uncompressed IVF store serve, probes 4 of 16
    def ivfDf: DataFrame =
      IvfIndex.serve(spark, ivfDir,
        queries.select($"query_id".as("vec_id"), $"q_qv".as("qv")),
        probes = 4, k = 5)
        .select($"query_id", $"neighbor")
    val ivfT = minOf("ivf_serve")(ivfDf)
    val recIvf = recall(ivfDf)
    // (e) composed tier: route coarse, Hamming-scan probed cells only
    def ivfBinDf: DataFrame =
      IvfBinaryStore.serve(spark, ivfBinDir, queries, k = 5,
        nprobe = 4, width = 64)
    val ivfBinT = minOf("ivfbin_serve")(ivfBinDf)
    val recIvfBin = recall(ivfBinDf)

    println(f"""{"tool":"BinaryScaleBench","n_codes":$nCodes,"n_queries":$nQueries,"reps":$reps,"copies":$copies,"cold":$cold,"exact_scan_sec":$exact%.3f,"binary_serve_sec":$binU%.3f,"binary_serve_cached_sec":$binC%.3f,"ivf_serve_sec":$ivfT%.3f,"ivfbin_serve_sec":$ivfBinT%.3f,"recall_binary_permille":$recBin,"recall_ivf_permille":$recIvf,"recall_ivfbin_permille":$recIvfBin,"sf":"$sfDir"}""")
    spark.stop()
  }
}
