package graft

import org.apache.spark.sql.functions._
import graft.sources.FileSources
import java.nio.file.Files

/** Streaming file sources: a landing directory consumed incrementally,
  * results equal to the batch computation over the same files.
  */
class FileStreamSpec extends SparkSpec {

  test("parquet landing dir streams incrementally and matches batch agg") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_fstream").toFile
    val out = s"graft_fstream_out_${System.nanoTime()}"
    try {
      val li = Tables(spark, sfDir, "lineitem")
        .select($"l_orderkey", $"l_quantity", $"l_returnflag")
      // two file drops, written before the stream starts
      li.filter($"l_orderkey" % 2 === 0).write.parquet(s"$dir/drop1.parquet")
      li.filter($"l_orderkey" % 2 =!= 0).write.parquet(s"$dir/drop2.parquet")
      val schema = li.schema
      val stream = FileSources.streamParquet(
          spark, s"$dir/*.parquet", schema, maxFilesPerTrigger = 1)
        .groupBy($"l_returnflag")
        .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
      val q = stream.writeStream.format("memory").queryName(out)
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        val streamed = spark.table(out).collect()
          .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
        val batch = li.groupBy($"l_returnflag")
          .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
          .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
        assert(streamed == batch && streamed.nonEmpty)
      } finally q.stop()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
      spark.sql(s"DROP TABLE IF EXISTS $out")
    }
  }

  test("csv landing dir streams with declared schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cstream").toFile
    val out = s"graft_cstream_out_${System.nanoTime()}"
    try {
      val src = Seq((1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.0))
        .toDF("k", "tag", "v")
      FileSources.writeCsv(src, s"$dir/drop.csv")
      val stream = FileSources.streamCsv(spark, s"$dir/*.csv", src.schema)
        .groupBy($"tag").agg(sum($"v").as("sv"))
      val q = stream.writeStream.format("memory").queryName(out)
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        val got = spark.table(out).collect()
          .map(r => (r.getString(0), r.getDouble(1))).toSet
        assert(got == Set(("a", 4.5), ("b", 2.5)))
      } finally q.stop()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
      spark.sql(s"DROP TABLE IF EXISTS $out")
    }
  }
}
