package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MaxSim store cost split — BUILD (one-time per release) vs SERVE
  * (per query batch): the q182 gate entry runs both back to back, so
  * its wall alone overstates what a deployment pays per batch. Also
  * prints a small-batch serve (100 docs) beside the gate's 1% sample,
  * since bucket pruning only bites when the batch's token set doesn't
  * cover all 64 buckets.
  *
  * Usage: runMain graft.tools.MaxSimStoreBench <sfDir> [reps=2]
  */
object MaxSimStoreBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = graft.operators.Scratch.dir(spark, "msbench")
    val docs = graft.operators.TextOps.docs(spark, sfDir)
    def timed(tag: String)(body: => Unit): Unit = {
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"$tag":${walls.min}%.2f,"reps":$reps}""")
    }
    timed("build_sec") {
      graft.operators.MaxSimStore.build(docs, dir)
    }
    timed("serve_1pct_sec") {
      graft.operators.MaxSimStore
        .serve(spark, dir, docs.filter($"doc_id" % 100 === 0))
        .write.format("noop").mode("overwrite").save()
    }
    timed("serve_100docs_sec") {
      graft.operators.MaxSimStore
        .serve(spark, dir, docs.filter($"doc_id" % 20000 === 0))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
