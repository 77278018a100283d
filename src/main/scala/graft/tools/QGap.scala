package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import scala.collection.mutable

/** Driver-gap profiler (guide §1, round-15 task 1): decomposes each
  * query's wall into Catalyst phases (analysis / optimization /
  * physical planning, from QueryPlanningTracker), job-covered wall
  * (union of job [start, end] intervals), and the residual driver gap
  * (wall − job-covered = AQE re-planning between jobs, codegen
  * compilation, sink setup — everything single-threaded on the driver
  * that the stage/job listeners cannot see).
  *
  * Usage: runMain graft.tools.QGap <sfDir> <name1,name2,...> [reps=3]
  * Runs reps warm passes, then ONE measured pass per query.
  */
object QGap {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
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

    // job intervals + stage sums for the measured run
    case class Job(start: Long, var end: Long)
    val jobs = mutable.Map[Int, Job]()
    var stageWall = 0L; var runMs = 0L; var cpuMs = 0L; var nStages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs(e.jobId) = Job(e.time, -1L) }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        jobs.synchronized {
          stageWall += (for { s <- si.submissionTime; c <- si.completionTime }
            yield c - s).getOrElse(0L)
          runMs += si.taskMetrics.executorRunTime
          cpuMs += si.taskMetrics.executorCpuTime / 1000000
          nStages += 1
        }
      }
    })
    // Catalyst phase times of every QueryExecution in the measured run
    // (the noop write's QE plus any AQE-internal ones that report)
    val phases = mutable.Map[String, Long]().withDefaultValue(0L)
    var capture = false
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        if (capture) phases.synchronized {
          qe.tracker.phases.foreach { case (k, v) =>
            phases(k) += (v.endTimeMs - v.startTimeMs) }
        }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    })

    spark.read.parquet(s"$sfDir/documents.parquet").count() // warmup

    println("query,wall_ms,build_ms,job_covered_ms,driver_gap_ms," +
      "analysis_ms,optimization_ms,planning_ms,n_jobs,n_stages," +
      "stage_wall_ms,run_ms,cpu_ms")
    names.foreach { name =>
      var buildMs = 0L
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        buildMs = (System.nanoTime() - t0) / 1000000
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      (0 until reps).foreach(_ => once()) // warm: codegen cache, schema cache
      jobs.synchronized { jobs.clear(); stageWall = 0; runMs = 0; cpuMs = 0
        nStages = 0 }
      phases.synchronized(phases.clear())
      capture = true
      val wall = once()
      capture = false
      Thread.sleep(300)
      val (covered, nJobs) = jobs.synchronized {
        val iv = jobs.values.filter(_.end > 0).map(j => (j.start, j.end))
          .toSeq.sortBy(_._1)
        // union of intervals
        var cov = 0L; var curS = Long.MinValue; var curE = Long.MinValue
        iv.foreach { case (s, e) =>
          if (s > curE) { cov += (curE - curS) max 0; curS = s; curE = e }
          else if (e > curE) curE = e
        }
        cov += (curE - curS) max 0
        (cov, iv.size)
      }
      val (a, o, p) = phases.synchronized {
        (phases("analysis"), phases("optimization"), phases("planning"))
      }
      val wallMs = (wall * 1000).toLong
      println(s"$name,$wallMs,$buildMs,$covered,${wallMs - covered},$a,$o," +
        s"$p,$nJobs,$nStages,$stageWall,$runMs,$cpuMs")
    }
    spark.stop()
  }
}
