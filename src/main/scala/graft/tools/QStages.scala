package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-stage wall/metrics profile of catalog queries (local iteration
  * tool, guide §1: decide whether a query's time is scan, shuffle,
  * broadcast build, or compute BEFORE changing it).
  *
  * Usage: runMain graft.tools.QStages <sfDir> <name1,name2,...> [reps=2]
  *
  * Each query runs `reps` warm runs (codegen/broadcast/schema caches)
  * plus one measured run through the noop sink. For the MEASURED run the
  * listener prints one line per stage: wall (submission→completion),
  * summed executor run/CPU time, input bytes, shuffle read/write bytes,
  * task count — plus the query wall so driver-only time (planning,
  * broadcast collect+build) shows up as the gap between stage wall sum
  * and query wall.
  */
object QStages {
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

    case class Row(id: Int, name: String, wallMs: Long, runMs: Long,
      cpuMs: Long, inMB: Double, srMB: Double, swMB: Double, tasks: Int)
    val buf = mutable.Buffer[Row]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        buf.synchronized {
          buf += Row(si.stageId, si.name.takeWhile(_ != '\n').take(60), wall,
            m.executorRunTime, m.executorCpuTime / 1000000,
            m.inputMetrics.bytesRead / 1e6,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            si.numTasks)
        }
      }
    })

    spark.read.parquet(s"$sfDir/documents.parquet").count() // warmup

    names.foreach { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      (0 until reps).foreach(_ => once()) // warm runs, dropped
      buf.synchronized(buf.clear())
      val wall = once()
      // listener delivery is async: poll until the buffer stops growing
      // (bounded) instead of one blind sleep
      var last = -1; var stable = 0; var waited = 0
      while (stable < 2 && waited < 2000) {
        Thread.sleep(100); waited += 100
        val n = buf.synchronized(buf.size)
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
      val rows = buf.synchronized(buf.sortBy(_.id).toVector)
      println(f"== $name wall=$wall%.3f s  stages=${rows.size} " +
        f"stageWallSum=${rows.map(_.wallMs).sum / 1e3}%.3f s")
      rows.foreach { r =>
        println(f"   [${r.id}%4d] wall=${r.wallMs}%5d ms run=${r.runMs}%6d " +
          f"cpu=${r.cpuMs}%6d in=${r.inMB}%7.1fMB sr=${r.srMB}%6.1fMB " +
          f"sw=${r.swMB}%6.1fMB tasks=${r.tasks}%3d  ${r.name}")
      }
    }
    spark.stop()
  }
}
