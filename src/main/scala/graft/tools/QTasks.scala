package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Task-level metric decomposition for one query (guide §1/§7): per
  * stage, the distribution of task deserialize / run / CPU / GC /
  * result-serialize times — what exactly a 30-task stage pays per task
  * that a 1-task stage paid once.
  *
  * Usage: runMain graft.tools.QTasks <sfDir> <name> [reps=3]
  */
object QTasks {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.openCostInBytes",
        graft.Bench.scanOpenCost(sfDir, cpus.toInt).toString)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class T(stage: Int, deserMs: Long, runMs: Long, cpuMs: Long,
      gcMs: Long, resSerMs: Long, schedDelayHint: Long)
    val buf = mutable.Buffer[T]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) buf.synchronized {
          buf += T(e.stageId, m.executorDeserializeTime,
            m.executorRunTime, m.executorCpuTime / 1000000,
            m.jvmGCTime, m.resultSerializationTime,
            e.taskInfo.finishTime - e.taskInfo.launchTime - m.executorRunTime
              - m.executorDeserializeTime)
        }
      }
    })

    spark.read.parquet(s"$sfDir/documents.parquet").count() // warmup
    def once(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (0 until reps).foreach(_ => once())
    buf.synchronized(buf.clear())
    val wall = once()
    Thread.sleep(500)
    val rows = buf.synchronized(buf.toVector)
    println(f"== $name wall=$wall%.3f s tasks=${rows.size}")
    rows.groupBy(_.stage).toSeq.sortBy(_._1).foreach { case (sid, ts) =>
      def s(f: T => Long) = ts.map(f).sum
      def mx(f: T => Long) = ts.map(f).max
      println(f"  stage $sid%4d n=${ts.size}%3d  deser=${s(_.deserMs)}%5d" +
        f" (max ${mx(_.deserMs)}%4d)  run=${s(_.runMs)}%6d (max ${mx(_.runMs)}%4d)" +
        f"  cpu=${s(_.cpuMs)}%6d  gc=${s(_.gcMs)}%4d  resSer=${s(_.resSerMs)}%3d" +
        f"  other=${s(_.schedDelayHint)}%5d")
    }
    spark.stop()
  }
}
