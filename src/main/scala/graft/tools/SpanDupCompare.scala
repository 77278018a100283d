package graft.tools

import java.util.Locale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps

/** Reproduces the q136/q143 hot-hash degrade measurement on demand:
  * `runMain graft.tools.SpanDupCompare <sfDir> [reps]`.
  *
  * Times the shipped window form (nSeg = 1) against the salt-split
  * degrade path (nSeg = 8) for both span operators, asserting
  * row-identity first — the same protocol as [[GraphRankCompare]]'s
  * `graph_rank_forms_sf10_sec` artifact entry. Prints ONE JSON line
  * (min over reps, per-form) for the bench artifact.
  */
object SpanDupCompare {

  private def docsF(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "documents").withColumn("toks", split($"text", "\\s+"))
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
      "q136_window" -> (() => TextOps.dupSpanCoverage(docsF(spark, sfDir), 1)),
      "q136_salted8" -> (() => TextOps.dupSpanCoverage(docsF(spark, sfDir), 8)),
      "q143_window" -> (() => TextOps.spanDedupBudget(docsF(spark, sfDir), 1)),
      "q143_salted8" -> (() => TextOps.spanDedupBudget(docsF(spark, sfDir), 8)))

    // correctness first: each degrade form must agree with its window form
    for (q <- Seq("q136", "q143")) {
      val w = forms.find(_._1 == s"${q}_window").get._2().collect().toSeq
      val d8 = forms.find(_._1 == s"${q}_salted8").get._2().collect().toSeq
      require(d8 == w, s"${q}_salted8 diverged from the window form")
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
    println(s"""{"metric":"span_dup_forms","unit":"sec","reps":$reps,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
