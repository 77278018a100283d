package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemDeDup (q171) scale probe — pair MASS printed beside wall, the
  * LshScale discipline: a wall number for an all-intra-cell-pairs
  * operator is only interpretable next to the candidate-pair count the
  * fixed 16-cell quantizer produces at that corpus size. The production
  * posture (scaladoc on q171) bounds cells via the split machinery;
  * this tool measures what the FIXED-quantizer gate entry costs as the
  * corpus grows, so the footnote is a number, not a guess.
  *
  * Usage: runMain graft.tools.SemDedupScale <sfDir> [reps=1]
  */
object SemDedupScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val emb = graft.operators.VectorOps.quantized(spark, sfDir)
    val n = emb.count()
    // the assignment the entry pairs within — measure its pair mass first
    val seeds = emb.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"qv".as("cq"))
    val (learned, _) = graft.operators.VectorOps.lloydTrain(emb, seeds,
      graft.operators.VectorOps.LloydMaxIters,
      graft.operators.VectorOps.LloydMinImprove)
    val cellSizes = graft.operators.VectorOps.argminPacked(emb, learned)
      .groupBy($"cid").agg(count(lit(1)).as("nc"))
      .select($"cid", $"nc").as[(Long, Long)].collect()
    val pairMass = cellSizes.map { case (_, c) => c * (c - 1) / 2 }.sum
    println(s"""{"corpus":$n,"cells":${cellSizes.length},""" +
      s""""max_cell":${cellSizes.map(_._2).max},"pair_mass":$pairMass}""")

    val walls = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      graft.operators.VectorOps.defs("q171_semdedup_lloyd")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"""{"q171_wall_sec":${walls.min}%.2f,"reps":$reps}""")

    // the CAP-BOUNDED production form (q181): exact copies collapse to
    // representatives first, then leaf sizes obey Σc² ≤ cap·N_distinct
    // — its pair mass must read LINEAR in corpus size where the
    // fixed-quantizer gate form reads quadratic
    val dreps = emb.groupBy($"qv").agg(min($"vec_id").as("vec_id"))
      .select($"vec_id", $"qv")
    val nReps = dreps.count()
    val capLeaves = graft.operators.VectorOps.cappedCells(dreps, learned,
        graft.operators.VectorOps.SemDedupCap,
        graft.operators.VectorOps.SemDedupMaxRounds)
      .groupBy($"cell").agg(count(lit(1)).as("nc"))
      .select($"cell", $"nc").as[(String, Long)].collect()
    val capPairs = capLeaves.map { case (_, c) => c * (c - 1) / 2 }.sum
    println(s"""{"n_distinct":$nReps,"capped_cells":${capLeaves.length},""" +
      s""""capped_max_cell":${capLeaves.map(_._2).max},""" +
      s""""capped_max_depth":${capLeaves.map(_._1.count(_ == '/')).max},""" +
      s""""capped_pair_mass":$capPairs,""" +
      s""""cap_times_n_bound":${graft.operators.VectorOps.SemDedupCap * nReps}}""")
    val cwalls = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      graft.operators.VectorOps.defs("q181_semdedup_capped")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"""{"q181_wall_sec":${cwalls.min}%.2f,"reps":$reps}""")
    spark.stop()
  }
}
