package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Nexmark

/** The reference's local per-epoch execution model (SURVEY §3.3,
  * launcher/local.rs + the q*.rs window loops): events are bucketed into
  * 1-second epochs and an element-wise query is applied to each epoch
  * independently, then results union. In Spark this is only needed to
  * reproduce the reference's exact element-wise semantics in tests — the
  * production path is a single declarative plan (batch) or a 1s-trigger
  * micro-batch stream (StreamOps).
  */
object EpochRunner {

  /** Epoch index of an event time (ms) at the generator base time. */
  def epochOf(tsMillis: Long): Long = (tsMillis - Nexmark.BaseTime) / 1000L

  /** Run `query` once per epoch over the bid stream and union results.
    * `query` must be element-wise (no cross-epoch state) for this to
    * equal the whole-batch run.
    */
  def elementwiseBids(spark: SparkSession, n: Long, eps: Long)
      (query: DataFrame => DataFrame): DataFrame = {
    val withEpoch = Nexmark.bids(spark, n, eps).toDF()
      .withColumn("__epoch", floor((unix_millis(col("b_date_time")) -
        lit(Nexmark.BaseTime)) / 1000L))
    val epochs = withEpoch.select("__epoch").distinct()
      .collect().map(_.getLong(0)).sorted
    epochs.map { e =>
      query(withEpoch.filter(col("__epoch") === e).drop("__epoch"))
    }.reduce(_.unionAll(_))
  }
}
