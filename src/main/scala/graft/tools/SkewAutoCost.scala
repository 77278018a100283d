package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{PipelineOps, TextOps}

/** Trigger-cost measurement for the round-9 auto skew degrades (feeds
  * the BENCH_SF10.json `skew_auto_round9` note): the sampled hot-key
  * pre-pass alone, next to the full operator walls it guards.
  *
  * Usage: runMain graft.tools.SkewAutoCost <sfDir>
  */
object SkewAutoCost {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String)(f: => Any): Double = {
      val t0 = System.nanoTime()
      val v = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[skew-auto] $name%-26s $s%6.2f s  ($v)")
      s
    }

    spark.read.parquet(s"$sfDir/documents.parquet").count() // warmup
    val docsF = TextOps.docs(spark, sfDir)
    time("span trigger (2% sample)")(TextOps.spanAutoNSeg(docsF))
    time("span trigger (rep 2)")(TextOps.spanAutoNSeg(docsF))
    time("q136 full (auto)") {
      graft.SparkEntry.queries("q136_dup_span_coverage")(spark, sfDir).count()
    }
    val edges = graft.Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_suppkey")
      .join(graft.Tables(spark, sfDir, "orders")
        .select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("c"), $"l_suppkey".as("sk"))
    time("graph trigger (post-join)")(PipelineOps.graphAutoNSeg(edges))
    def pushedSample = {
      val f = graft.plans.SkewSketch.DefaultFraction
      val sm = graft.Tables(spark, sfDir, "lineitem")
        .sample(f, graft.plans.SkewSketch.DefaultSeed)
        .select($"l_orderkey", $"l_suppkey")
        .join(graft.Tables(spark, sfDir, "orders")
          .select($"o_orderkey", $"o_custkey"),
          $"l_orderkey" === $"o_orderkey")
        .select($"o_custkey".as("c"), $"l_suppkey".as("sk"))
      PipelineOps.graphNSegFromSample(sm, f)
    }
    time("graph trigger (pushed)")(pushedSample)
    time("graph trigger (pushed, rep 2)")(pushedSample)
    time("q110 full (auto)") {
      graft.SparkEntry.queries("q110_graph_rank")(spark, sfDir).count()
    }
    spark.stop()
  }
}
