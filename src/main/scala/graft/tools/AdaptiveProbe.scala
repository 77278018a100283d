package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Adaptive-probe operating-point sweep — the measurement behind the
  * q173 adaptive row's pinned ratio: recall@5 (ADC and shortlist-25 +
  * exact refine) and probed posting mass for the FIXED nprobe levels
  * {1, 2, 4} next to the distance-ratio-adaptive rule at several
  * ratios. The pinned production point must beat fixed nprobe=2 on
  * recall at equal or lower probed mass — this tool is where that
  * claim's numbers come from.
  *
  * Usage: runMain graft.tools.AdaptiveProbe <sfDir> [clustered]
  *
  * `clustered` reshapes the near-isotropic driver embeddings into 24
  * well-separated topic clusters before the sweep (deterministic:
  * vector i joins cluster i % 24, whose anchor is corpus vector
  * (i % 24) scaled ×3 — anchor separation ≈ 9× the intra-cluster
  * spread in squared distance). Real embedding corpora are clustered,
  * and this is where the distance-ratio rule's per-query probe-count
  * adaptation should separate from fixed nprobe: interior queries see
  * a huge best-to-next centroid gap (probe 1, save mass), boundary
  * queries see a near-tie (probe wide, buy recall).
  */
object AdaptiveProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val clustered = args.lift(1).contains("clustered")
    val anchorScale = args.lift(2).map(_.toLong).getOrElse(3L)
    val nClusters = args.lift(3).map(_.toInt).getOrElse(24)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb0 = graft.operators.VectorOps.quantized(spark, sfDir)
    val emb = (if (clustered) {
      val anchors = emb0.filter($"vec_id" < nClusters)
        .select($"vec_id".as("c"),
          expr(s"transform(qv, x -> x * ${anchorScale}L)").as("aq"))
      emb0.withColumn("c", $"vec_id" % nClusters)
        .join(broadcast(anchors), "c")
        .select($"vec_id", expr("zip_with(aq, qv, (a, x) -> a + x)").as("qv"))
    } else emb0).localCheckpoint(true)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_adapt").toString + "/ix"
    graft.operators.IvfIndex.buildPq(emb, dir)
    val queries = emb.filter($"vec_id" % 100 === 0).localCheckpoint(true)
    // exact ground truth (the session brute force, local to the tool)
    val ex = emb.crossJoin(broadcast(queries
        .select($"vec_id".as("query_id"), $"qv".as("q_qv"))))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor"),
        graft.functions.VectorMath.sqDistLong($"qv", $"q_qv").as("dist"))
      .groupBy($"query_id")
      .agg(graft.functions.BoundedAggs.topScored(
        -$"dist".cast("double"), $"neighbor", lit(true), 5).as("top"))
      .select($"query_id", explode($"top").as("t"))
      .select($"query_id", $"t.id".as("neighbor"))
      .localCheckpoint(true)
    val kTotal = ex.count()

    val snap = graft.operators.IvfIndex.readSnapshot(spark, dir)
    val cents = graft.operators.IvfIndex.centroids(spark, dir)
    val sizes = graft.operators.IvfIndex.postings(spark, dir)
      .groupBy($"cid").agg(count(lit(1)).as("csz")).localCheckpoint(true)
    val scored = queries.crossJoin(broadcast(cents))
      .withColumn("cdist",
        graft.functions.VectorMath.sqDistLong($"qv", $"cq"))
      .withColumn("crank", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"cdist", $"cid")))
      .withColumn("cbest",
        min($"cdist").over(Window.partitionBy($"vec_id")))
      .join(broadcast(sizes), Seq("cid"))
      .select($"vec_id", $"cid", $"cdist", $"crank", $"cbest", $"csz")
      .localCheckpoint(true)

    // each corpus vector's home cell, for the routing-ceiling column
    val homes = graft.operators.IvfIndex.postings(spark, dir)
      .select($"vec_id".as("neighbor"), $"cid").localCheckpoint(true)

    def recallRow(tag: String, probedRel: DataFrame,
        shortlist: DataFrame): Unit = {
      val mass = probedRel.agg(sum($"csz")).head().getLong(0)
      // routing ceiling: exact top-5 hits whose home cell the query
      // probed — what a PERFECT ranker over the probed cells would get
      val ceilHits = ex.join(homes, Seq("neighbor"))
        .join(probedRel.select($"vec_id".as("query_id"), $"cid"),
          Seq("query_id", "cid"), "left_semi").count()
      val s = shortlist.select($"query_id", $"rank", $"neighbor")
        .localCheckpoint(true)
      val adcHits = ex.join(s.filter($"rank" <= 5)
          .select($"query_id", $"neighbor"),
        Seq("query_id", "neighbor"), "left_semi").count()
      def refHits(sk: Int): Long = {
        val r5 = graft.operators.IvfIndex.refineShortlist(spark, queries,
            emb, s.filter($"rank" <= sk).select($"query_id", $"neighbor"), 5)
          .select($"query_id", $"neighbor")
        ex.join(r5, Seq("query_id", "neighbor"), "left_semi").count()
      }
      println(s"""{"mode":"$tag","probed_mass":$mass,""" +
        s""""adc_permille":${adcHits * 1000 / kTotal},""" +
        s""""refine25_permille":${refHits(25) * 1000 / kTotal},""" +
        s""""refine100_permille":${refHits(100) * 1000 / kTotal},""" +
        s""""ceiling_permille":${ceilHits * 1000 / kTotal}}""")
    }

    Seq(1, 2, 4).foreach { p =>
      recallRow(s"fixed_$p", scored.filter($"crank" <= p),
        graft.operators.IvfIndex.servePq(spark, dir, queries, p, 100))
    }
    Seq((21L, 20L), (11L, 10L), (17L, 16L), (9L, 8L), (23L, 20L),
        (5L, 4L)).foreach { case (nu, de) =>
      val rule = col("crank") === 1 ||
        (col("crank") <= graft.operators.IvfIndex.AdaptMaxProbes &&
          col("cdist") * de <= col("cbest") * nu)
      recallRow(s"adaptive_${nu}_$de", scored.filter(rule),
        graft.operators.IvfIndex.servePqAdaptive(spark, dir, queries,
          nu, de, graft.operators.IvfIndex.AdaptMaxProbes, 100))
    }
    spark.stop()
  }
}
