package graft

import org.apache.spark.sql.functions._
import graft.functions.ProcTime

/** The injectable processing-time clock: wall clock by default, the
  * caller's deterministic arrival model when the session opts in.
  */
class ProcTimeSpec extends SparkSpec {

  test("deterministic mode returns the arrival model exactly") {
    import spark.implicits._
    spark.conf.set(ProcTime.ModeKey, ProcTime.Deterministic)
    try {
      val df = Seq(("2020-01-01 00:00:00", 1)).toDF("t", "x")
        .withColumn("t", to_timestamp($"t"))
        .withColumn("p_time", ProcTime.stamp(spark, $"t" + expr("INTERVAL 2 SECONDS")))
      val r = df.select(date_format($"p_time", "yyyy-MM-dd HH:mm:ss")).head().getString(0)
      assert(r == "2020-01-01 00:00:02")
    } finally spark.conf.unset(ProcTime.ModeKey)
  }

  test("wallclock mode stamps the current time, not the model") {
    import spark.implicits._
    val now = System.currentTimeMillis()
    val df = Seq(("2020-01-01 00:00:00", 1)).toDF("t", "x")
      .withColumn("t", to_timestamp($"t"))
      .withColumn("p_time", ProcTime.stamp(spark, $"t"))
    val stamped = df.select($"p_time").head().getTimestamp(0).getTime
    // within a generous minute of the driver clock; nowhere near 2020
    assert(math.abs(stamped - now) < 60000L)
  }

  test("proctime queries are reproducible under the deterministic clock") {
    spark.conf.set(ProcTime.ModeKey, ProcTime.Deterministic)
    try {
      val a = operators.Windows.defs("q27_proctime_global")(spark, sfDir).collect()
      val b = operators.Windows.defs("q27_proctime_global")(spark, sfDir).collect()
      assert(a.nonEmpty && a.sameElements(b))
    } finally spark.conf.unset(ProcTime.ModeKey)
  }
}
