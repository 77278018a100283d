package graft

import org.apache.spark.sql.functions._

/** Partition-pruning evidence for the hive-layout path
  * (`FileSources.writePartitioned`): at 100 TB the date-partitioned
  * layout is the first pruning lever — a day-filtered read must touch
  * one directory, not the corpus. The plan must show the filter as a
  * PartitionFilter (metadata-only) rather than a data Filter.
  */
class PartitionPruneSpec extends SparkSpec {

  test("day-partitioned write is pruned to one partition on read") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = Tables(spark, sfDir, "events")
      .withColumn("day", to_date($"ts").cast("string"))
    sources.FileSources.writePartitioned(ev, dir, Seq("day"))
    val read = spark.read.parquet(dir).filter($"day" === "2024-01-05")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(day"),
      s"day filter did not become a partition filter:\n$plan")
    // pruning must not change results vs filtering the unpartitioned data
    // (collect() drives THIS queryExecution, so its scan metrics populate)
    assert(read.collect().length.toLong ===
      ev.filter($"day" === "2024-01-05").count())
    // and the executed scan must have READ strictly fewer files than the
    // table has (inputFiles on the DataFrame ignores pruning; the scan
    // node's numFiles metric reflects the pruned selection)
    val allFiles = read.sparkSession.read.parquet(dir).inputFiles.length
    val scanned = read.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.sum
    assert(scanned > 0 && scanned < allFiles,
      s"pruned scan read $scanned of $allFiles files")
  }
}
