package graft.tools

import org.apache.spark.sql.SparkSession

/** Minimal scan-parallelism experiment (local iteration only): times a
  * two-column aggregate over lineitem at several forced split counts to
  * isolate the per-task fixed cost of a parallel parquet scan from the
  * query around it.
  *
  * Usage: runMain graft.tools.ScanProbe <sfDir>
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    def run(tag: String, openCost: Long, minPN: Int): Unit = {
      spark.conf.set("spark.sql.files.openCostInBytes", openCost.toString)
      spark.conf.set("spark.sql.files.minPartitionNum", minPN.toString)
      val walls = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        spark.read.parquet(s"$sfDir/lineitem.parquet")
          .agg(sum(col("l_extendedprice")), sum(col("l_quantity")))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val parts = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .rdd.getNumPartitions
    println(f"[scanprobe] $tag%-22s splits=$parts%3d  min=${walls.min}%.3f" +
      f"  all=${walls.map(w => f"$w%.3f").mkString(",")}")
    }
    run("serial (4MB oc)", 4L * 1024 * 1024, 1)
    run("8-way", 2L * 1024 * 1024, 8)
    run("16-way", 1L * 1024 * 1024, 16)
    run("32-way (bench conf)", graft.Bench.scanOpenCost(sfDir, cpus.toInt),
      cpus.toInt)
    spark.stop()
  }
}
