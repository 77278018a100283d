package graft.tools

import java.util.Locale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.PipelineOps

/** Reproduces the q110 physical-design measurement on demand:
  * `runMain graft.tools.GraphRankCompare <sfDir> [reps]`.
  *
  * Times three forms of the same int64 mass propagation and asserts they
  * return identical top-20 rows:
  *  - `adjacency`   — the shipped plan (adjacency lists, nSeg = 1)
  *  - `adjacency8`  — the hub-skew degrade path (nSeg = 8 salt segments)
  *  - `edgelist`    — the pre-round-5 plan (distinct edge relation,
  *                    per-round degree joins), kept here verbatim as the
  *                    measured-against baseline
  * Prints ONE JSON line (min over reps, per-form) for the bench artifact.
  */
object GraphRankCompare {

  /** The round-4 edge-list q110, verbatim: every round joins the full
    * edge relation against the degree tables — two extra edge-volume
    * shuffles per round that the adjacency form folds into its build.
    */
  private def edgeListRank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val edges = Tables(s, d, "lineitem").select($"l_orderkey", $"l_suppkey")
      .join(Tables(s, d, "orders").select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("c"), $"l_suppkey".as("sk"))
      .distinct()
    val outC = edges.groupBy($"c").agg(count(lit(1)).as("oc"))
    val outS = edges.groupBy($"sk").agg(count(lit(1)).as("os"))
    val a1 = edges.join(outC, "c")
      .groupBy($"sk").agg(sum(expr("1000000 div oc")).as("mass_r1"))
    val m1 = edges.join(outS, "sk").join(a1, "sk")
      .groupBy($"c").agg(sum(expr("mass_r1 div os")).as("m1"))
    val a2 = edges.join(outC, "c").join(m1, "c")
      .groupBy($"sk").agg(sum(expr("m1 div oc")).as("mass_r2"))
    a1.join(a2, "sk").join(outS, "sk")
      .select($"sk".as("s_suppkey"), $"os".as("n_customers"),
        $"mass_r1", $"mass_r2")
      .orderBy($"mass_r2".desc, $"s_suppkey")
      .limit(20)
  }

  private def adjacencyRank(s: SparkSession, d: String, nSeg: Int): DataFrame = {
    import s.implicits._
    val edges = Tables(s, d, "lineitem").select($"l_orderkey", $"l_suppkey")
      .join(Tables(s, d, "orders").select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("c"), $"l_suppkey".as("sk"))
    PipelineOps.graphRank(edges, nSeg)
      .orderBy($"mass_r2".desc, $"s_suppkey").limit(20)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val forms: Seq[(String, () => DataFrame)] = Seq(
      "adjacency" -> (() => adjacencyRank(spark, sfDir, 1)),
      "adjacency8" -> (() => adjacencyRank(spark, sfDir, 8)),
      "edgelist" -> (() => edgeListRank(spark, sfDir)))

    // correctness first: all three must agree row-for-row
    val rows = forms.map { case (n, f) => n -> f().collect().toSeq }
    rows.tail.foreach { case (n, r) =>
      require(r == rows.head._2, s"$n diverged from ${rows.head._1}")
    }

    val timed = forms.map { case (n, f) =>
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      n -> ts.min
    }
    val qs = timed.map { case (n, t) =>
      "\"" + n + "\":" + String.format(Locale.ROOT, "%.2f", Double.box(t))
    }.mkString("{", ",", "}")
    println(s"""{"metric":"graph_rank_forms","unit":"sec","reps":$reps,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
