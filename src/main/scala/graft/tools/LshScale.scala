package graft.tools

import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Work-normalized scaling measurement for the LSH family (round-8
  * verdict item 8): q61/q86/q148's sf10 wall ratios read as regressions
  * only because the OUTPUT relation (true near-dup pairs) grows faster
  * than the corpus — the driver generator derives documents from a
  * shared template pool, so near-dup clusters are dense and a cluster
  * of size s contributes s(s-1)/2 pairs. This tool measures wall AND
  * produced-pair mass at two scales and emits the per-pair throughput
  * ratio — the number that is actually comparable across scales.
  *
  * Usage: runMain graft.tools.LshScale <smallDir> <bigDir> [factor]
  */
object LshScale {
  def main(args: Array[String]): Unit = {
    val small = args(0)
    val big = args(1)
    val factor = args.lift(2).map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class M(wall: Double, work: Long)
    def run(name: String, dir: String, work: org.apache.spark.sql.DataFrame => Long): M = {
      val t0 = System.nanoTime()
      val w = work(graft.SparkEntry.queries(name)(spark, dir))
      M((System.nanoTime() - t0) / 1e9, w)
    }

    val scenarios: Seq[(String, org.apache.spark.sql.DataFrame => Long)] = Seq(
      ("q61_minhash_md5", _.count()),                       // rows = pairs
      ("q148_split_leakage",
        df => df.agg(sum(col("n_pairs"))).head().getLong(0)), // pair mass
      ("q86_dedup_pipeline",
        df => df.agg(sum(col("n_fuzzy_removed"))).head().getLong(0)))

    spark.read.parquet(s"$small/documents.parquet").count() // warmup
    val rows = scenarios.map { case (name, workOf) =>
      val s = run(name, small, workOf)
      val b = run(name, big, workOf)
      val line = String.format(Locale.ROOT,
        """{"query":"%s","small_wall":%.2f,"big_wall":%.2f,""" +
          """"small_work":%d,"big_work":%d,"wall_ratio":%.1f,""" +
          """"work_ratio":%.1f,"per_work_speedup":%.1f}""",
        name, Double.box(s.wall), Double.box(b.wall),
        Long.box(s.work), Long.box(b.work),
        Double.box(b.wall / s.wall), Double.box(b.work.toDouble / s.work),
        Double.box((b.work.toDouble / s.work) / (b.wall / s.wall)))
      println(s"[lsh-scale] $line")
      line
    }
    println(s"""{"metric":"lsh_scale","factor":$factor,""" +
      s""""rows":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
