package graft.tools

import org.apache.spark.sql.SparkSession

/** Times a named catalog query under several scan-split sizes (local
  * iteration): openCostInBytes is read at execution planning, so one
  * built DataFrame re-times under each value — same file, same plan
  * shape, only the file-split grid varies.
  *
  * Usage: runMain graft.tools.QSplit <sfDir> <name1,name2,...> [reps=4]
  */
object QSplit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/documents.parquet").count() // warmup

    val settings = Seq(
      "serial-4m" -> (4L * 1024 * 1024),
      "oc-256k" -> (256L * 1024),
      "oc-64k" -> (64L * 1024),
      "bench" -> graft.Bench.scanOpenCost(sfDir, cpus.toInt))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val line = settings.map { case (tag, oc) =>
        spark.conf.set("spark.sql.files.openCostInBytes", oc.toString)
        val walls = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        f"$tag=${walls.min}%.3f"
      }.mkString("  ")
      println(s"[qsplit] $name  $line")
    }
    spark.stop()
  }
}
