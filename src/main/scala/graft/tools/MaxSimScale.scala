package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q178 scale probe — candidate-pair MASS printed beside wall (the
  * LshScale/SemDedupScale discipline): the late-interaction scorer's
  * cost is the rare-token candidate mass, so the wall number is only
  * interpretable next to the chunk count, the prefix relation size,
  * and the pair count the rare-2 rule produces at that corpus size.
  *
  * Usage: runMain graft.tools.MaxSimScale <sfDir> [reps=1]
  */
object MaxSimScale {
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
    import org.apache.spark.sql.expressions.Window

    val raw = graft.operators.PipelineOps.cdcChunks(
        graft.Tables(spark, sfDir, "documents")
          .withColumn("toks", split($"text", "\\s+")))
      .select($"doc_id",
        conv(substring(md5($"chunk"), 1, 15), 16, 10).cast("long").as("h"),
        $"chunk")
    val otoks = raw.select($"doc_id", $"h",
      explode(split($"chunk", " ")).as("tok"))
    val tokd = otoks.distinct()
    val nChunks = tokd.select($"doc_id", $"h").distinct().count()
    val dfRel = tokd.groupBy($"tok").agg(count(lit(1)).as("tok_df"))
    val pref = tokd.join(dfRel, "tok")
      .withColumn("pos", row_number().over(
        Window.partitionBy($"doc_id", $"h").orderBy($"tok_df", $"tok")))
      .filter($"pos" <= 2)
      .select($"doc_id", $"h", $"tok")
      .localCheckpoint(true)
    val nPref = pref.count()
    // pair mass = sum over tokens of qCount * cCount (minus self pairs)
    val perTok = pref.groupBy($"tok")
      .agg(count(lit(1)).as("c"),
        sum(when($"doc_id" % 100 === 0, 1L).otherwise(0L)).as("q"))
    val mass = perTok.agg(
        sum($"q" * $"c").as("qc"),
        max($"c").as("hottest"))
      .select($"qc", $"hottest").as[(Long, Long)].first()
    println(s"""{"chunks":$nChunks,"prefix_rows":$nPref,""" +
      s""""pair_mass_upper":${mass._1},"hottest_token_chunks":${mass._2}}""")

    // staged walls over the SAME checkpointed prefix relation, to place
    // the operator's cost: candidate enumeration vs scoring
    val t1 = System.nanoTime()
    val cand = pref.filter($"doc_id" % 100 === 0)
      .select($"doc_id".as("qdoc"), $"h".as("qh"), $"tok")
      .join(pref.select($"doc_id".as("cdoc"), $"h".as("cc"), $"tok"), "tok")
      .filter($"qdoc" =!= $"cdoc")
      .select($"qdoc", $"qh", $"cdoc", $"cc").distinct()
    val nCand = cand.count()
    val tCand = (System.nanoTime() - t1) / 1e9
    println(f"""{"cand_pairs":$nCand,"cand_wall_sec":$tCand%.2f}""")

    val walls = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      graft.operators.TextOps.defs("q178_maxsim_chunks")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"""{"q178_wall_sec":${walls.min}%.2f,"reps":$reps}""")
    spark.stop()
  }
}
