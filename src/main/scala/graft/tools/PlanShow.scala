package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc executed-plan inspector: `runMain graft.tools.PlanShow <sfDir> <query>`
  * collects the query (finalizing AQE) and prints the join/exchange skeleton.
  */
object PlanShow {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    val t0 = System.nanoTime()
    df.collect()
    println(f"wall: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val p = df.queryExecution.executedPlan.toString
    if (sys.env.contains("GRAFT_PLAN_FULL")) println(p)
    else println(p.linesIterator.filter(l =>
      Seq("Join", "Exchange", "AQEShuffleRead", "Scan parquet", "HashAggregate")
        .exists(l.contains)).mkString("\n"))
    spark.stop()
  }
}
