package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved fixture A/B (local iteration): times each named query
  * against TWO testdata dirs in alternating reps inside one session, so
  * host-interference windows hit both sides equally and the min-of-reps
  * difference is attributable to the fixture alone.
  *
  * Usage: runMain graft.tools.AbFixture <dirA> <dirB> <names> [reps=6]
  */
object AbFixture {
  def main(args: Array[String]): Unit = {
    val dirA = args(0)
    val dirB = args(1)
    val names = args(2).split(",").toSeq
    val reps = args.lift(3).map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.openCostInBytes",
        graft.Bench.scanOpenCost(dirB, cpus.toInt).toString)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dirB/documents.parquet").count() // warmup

    names.foreach { name =>
      val dfA = graft.SparkEntry.queries(name)(spark, dirA)
      val dfB = graft.SparkEntry.queries(name)(spark, dirB)
      def once(df: org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once(dfA); once(dfB) // warm both
      val (as, bs) = (1 to reps).map(_ => (once(dfA), once(dfB))).unzip
      println(f"[abfix] $name%-24s A=${as.min}%.3f B=${bs.min}%.3f " +
        f"(B/A=${bs.min / as.min}%.2f)  allA=${as.map(x => f"$x%.2f").mkString(",")}" +
        f"  allB=${bs.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
