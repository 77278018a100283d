package graft.tools

import java.util.Locale

import org.apache.spark.sql.SparkSession

/** Generic per-query wall timer (local iteration tool; feeds the
  * BENCH_SF10.json round-tail sections): min-of-N reps per named
  * catalog entry on one corpus dir.
  *
  * Usage: runMain graft.tools.QTime <sfDir> <name1,name2,...> [reps=2]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.openCostInBytes",
        graft.Bench.scanOpenCost(sfDir, cpus.toInt).toString)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/documents.parquet").count() // warmup

    val rows = names.map { name =>
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // noop-sink materialization (Bench's scheme): count() lets the
        // optimizer PRUNE expensive branches that feed only unused
        // columns (e.g. eliminate a left join against a unique-keyed
        // aggregate), silently under-measuring
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val w = walls.min
      println(f"[qtime] $name%-28s min=$w%6.2f s  (all: ${
        walls.map(x => f"$x%.2f").mkString(", ")})")
      String.format(Locale.ROOT, """"%s":%.2f""", name, Double.box(w))
    }
    println(s"""{"metric":"qtime","sf":"$sfDir","reps":$reps,""" +
      s""""min_sec":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
