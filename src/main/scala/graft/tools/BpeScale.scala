package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.TextOps

/** Large-K parallel-BPE measurement (local iteration tool; feeds the
  * BENCH_SF10.json `bpe64` section): trains `k` merges at each given
  * batch size on the corpus and reports driver rounds + wall, then
  * asserts the batched merge sequences are BIT-EQUAL to the batchM = 1
  * strictly-sequential run — the equality oracle at scales where the
  * per-merge DuckDB CTE replay (q144, K = 8) stops being tractable.
  *
  * Usage: runMain graft.tools.BpeScale <sfDir> <k> [batchMs, default 1,8]
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = if (args.length > 1) args(1).toInt else 64
    val batches =
      if (args.length > 2) args(2).split(",").toSeq.map(_.toInt)
      else Seq(1, 8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = TextOps.docs(spark, sfDir)
    base.count() // warmup: page-cache the corpus so batch sizes compare fair

    var reference: Seq[(Long, String, String, String, Long)] = null
    val results = batches.map { m =>
      val t0 = System.nanoTime()
      val (merges, _, rounds) = TextOps.bpeTrainOn(base, k, m)
      val got = {
        import spark.implicits._
        merges.orderBy($"merge_rank")
          .as[(Long, String, String, String, Long)].collect().toSeq
      }
      val wall = (System.nanoTime() - t0) / 1e9
      if (m == 1) reference = got
      val equal = reference == null || got == reference
      require(equal, s"batchM=$m diverged from the sequential trainer")
      println(f"""{"tool":"bpe_scale","sf":"$sfDir","k":$k,"batchM":$m,""" +
        f""""rounds":$rounds,"wall_sec":$wall%.2f,"seq_equal":$equal}""")
      (m, rounds, wall)
    }
    results.foreach { case (m, r, w) =>
      println(f"[bpe64] batchM=$m%-3d rounds=$r%-4d wall=$w%7.2f s")
    }
    spark.stop()
  }
}
