package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-commit cost decomposition of the flat-store ingest path (local
  * iteration, round-15 task 4): times real BinaryStore.addBatch commits,
  * then the constituent operations separately (localCheckpoint, codes
  * write, bucketed vectors write with and without the repartition) so
  * the fixed cost per commit is attributable before changing anything.
  *
  * Usage: runMain graft.tools.IngestProbe [batchRows=128] [commits=8]
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val batchRows = args.lift(0).map(_.toInt).getOrElse(128)
    val commits = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dim = 64
    def vec(id: Long): Array[Long] = {
      val rng = new graft.sources.Nexmark.Rng(id + 5_000_000L)
      Array.fill(dim)((rng.nextInt(201) - 100).toLong)
    }
    val base = (0L until 1024L).map(i => (i, vec(i)))
    val dir = graft.operators.Scratch.dir(spark, "ingest_probe")
    graft.operators.BinaryStore.build(base.toDF("vec_id", "qv"), dir)

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ingestprobe] $tag%-34s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
      r
    }

    // real addBatch commits
    (1 to commits).foreach { g =>
      val rows = ((g * 100000L) until (g * 100000L + batchRows))
        .map(i => (i, vec(i)))
      val df = rows.toDF("vec_id", "qv")
      time(s"addBatch gen=$g rows=$batchRows")(
        graft.operators.BinaryStore.addBatch(spark, dir, df, g))
    }

    // constituent pieces on a fresh batch (gen ids far away)
    val rows = (900000L until 900000L + batchRows).map(i => (i, vec(i)))
    val df0 = rows.toDF("vec_id", "qv")
    val ck = time("localCheckpoint(true)")(df0.localCheckpoint(true))
    time("isEmpty")(ck.isEmpty)
    val scratch = dir + "_pieces"
    time("codes write (1 file)") {
      graft.operators.VectorOps.binaryCodes(ck)
        .select($"vec_id", $"w0", $"w1", lit(999L).as("gen"))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("gen").parquet(s"$scratch/codes")
    }
    time("vectors write WITH repartition") {
      ck.select($"vec_id", $"qv", lit(999L).as("gen"),
          pmod($"vec_id", lit(64L)).as("bucket"))
        .repartition($"bucket")
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("gen", "bucket").parquet(s"$scratch/vecs_rep")
    }
    time("vectors write NO repartition") {
      ck.select($"vec_id", $"qv", lit(999L).as("gen"),
          pmod($"vec_id", lit(64L)).as("bucket"))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("gen", "bucket").parquet(s"$scratch/vecs_norep")
    }
    time("manifest read")(graft.operators.FlatManifest.read(spark, dir))

    // write-path variants, 3 reps each (steady state)
    (1 to 3).foreach { r =>
      time(s"plain write fresh dir (rep $r)") {
        ck.write.mode(SaveMode.Overwrite).parquet(s"$scratch/plain$r")
      }
      time(s"partitionBy gen fresh dir (rep $r)") {
        ck.withColumn("gen", lit(r.toLong))
          .write.mode(SaveMode.Overwrite)
          .partitionBy("gen").parquet(s"$scratch/pb$r")
      }
      time(s"dyn-overwrite EXISTING codes (rep $r)") {
        graft.operators.VectorOps.binaryCodes(ck)
          .select($"vec_id", $"w0", $"w1", lit(900L + r).as("gen"))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("gen").parquet(s"$scratch/codes")
      }
      time(s"coalesce(1) vectors write (rep $r)") {
        ck.select($"vec_id", $"qv", lit(900L + r).as("gen"),
            pmod($"vec_id", lit(64L)).as("bucket"))
          .coalesce(1)
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("gen", "bucket").parquet(s"$scratch/vecs_norep")
      }
      time(s"tmp-dir + rename vectors write (rep $r)") {
        val fs = graft.operators.FlatManifest.fs(spark, scratch)
        val tmp = new org.apache.hadoop.fs.Path(s"$scratch/vecs2/.gen-tmp-$r")
        ck.select($"vec_id", $"qv",
            pmod($"vec_id", lit(64L)).as("bucket"))
          .write.mode(SaveMode.Overwrite)
          .partitionBy("bucket").parquet(tmp.toString)
        val dest = new org.apache.hadoop.fs.Path(s"$scratch/vecs2/gen=${900 + r}")
        fs.mkdirs(dest.getParent)
        fs.rename(tmp, dest)
      }
      time(s"tmp-dir + rename codes write (rep $r)") {
        val fs = graft.operators.FlatManifest.fs(spark, scratch)
        val tmp = new org.apache.hadoop.fs.Path(s"$scratch/codes2/.gen-tmp-$r")
        graft.operators.VectorOps.binaryCodes(ck)
          .select($"vec_id", $"w0", $"w1")
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        val dest = new org.apache.hadoop.fs.Path(s"$scratch/codes2/gen=${900 + r}")
        fs.mkdirs(dest.getParent)
        fs.rename(tmp, dest)
      }
    }
    spark.stop()
  }
}
