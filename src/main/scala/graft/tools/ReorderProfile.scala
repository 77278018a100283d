package graft.tools

import java.sql.Timestamp
import java.util.Locale

import org.apache.spark.sql.SparkSession
import graft.StreamBench
import graft.streaming.StreamOps

/** Rate-vs-slack and rate-vs-key-cardinality profile for the
  * watermark-reorder state machines (round-8 verdict item 6): the
  * per-key buffer in [[StreamOps.reorderByWatermark]] /
  * [[StreamOps.cdcApplyOrderedStream]] is rewritten WHOLE into state on
  * every micro-batch that touches the key, so the suspected cost model
  * is "re-serialized rows per batch ≈ total buffered events ≈
  * slack × event rate" — linear in slack, roughly independent of how
  * many keys the same buffered mass is spread over. This sweep measures
  * exactly those two axes; feeds BENCH_SF10.json stream_profile_round9.
  *
  * Usage: runMain graft.tools.ReorderProfile [nEvents] [batch] [cpus]
  */
object ReorderProfile {

  private val Base = 1_436_918_400_000L

  /** Touch events: ts advances 1 ms/event (1000 events/s in EVENT
    * time), keys round-robin, delivery scrambled inside blocks of
    * `scramble` events (disorder << every tested slack, so nothing
    * drops late and every config reorders the same mass).
    */
  private def genScrambledTouch(n: Int, keys: Int,
      scramble: Int): Seq[StreamOps.TouchEvent] = {
    val rng = new scala.util.Random(11)
    (0 until n).map { i =>
      val isClick = i % 3 != 0
      StreamOps.TouchEvent(i.toLong % keys, new Timestamp(Base + i),
        i.toLong, if (isClick) "click" else "purchase", 1.0,
        if (isClick) i % 7 else -1L)
    }.grouped(scramble).flatMap(b => rng.shuffle(b)).toSeq
  }

  private def genScrambledCdc(n: Int, keys: Int,
      scramble: Int): Seq[StreamOps.CdcEvent] = {
    val rng = new scala.util.Random(13)
    (0 until n).map { i =>
      StreamOps.CdcEvent(i.toLong % keys, new Timestamp(Base + i),
        i.toLong, if (i % 10 == 0) "delete" else "upsert", s"p$i")
    }.grouped(scramble).flatMap(b => rng.shuffle(b)).toSeq
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(240000)
    val batch = args.lift(1).map(_.toInt).getOrElse(60000)
    val cpus = args.lift(2).getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the reorder -> attribution chain intentionally emits at the
      // watermark boundary (see reorderByWatermark composition notes)
      .config("spark.sql.streaming.statefulOperator.checkCorrectness.enabled",
        "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    implicit val touchOrd: Ordering[StreamOps.TouchEvent] =
      Ordering.by(e => (e.ts.getTime, e.event_id))

    def reorderChainRate(slackS: Int, keys: Int): Double =
      StreamBench.rateOf(spark, s"reorder+attrib/slack=${slackS}s/keys=$keys",
        genScrambledTouch(n, keys, scramble = 800), batch) { in =>
        StreamOps.attributionStream(
          StreamOps.reorderByWatermark(
            in.toDS().withWatermark("ts", s"$slackS seconds"),
            (e: StreamOps.TouchEvent) => e.user_id,
            (e: StreamOps.TouchEvent) => e.ts.getTime)).toDF()
      }._2

    def cdcOrderedRate(slackS: Int, keys: Int): Double =
      StreamBench.rateOf(spark, s"cdcOrdered/slack=${slackS}s/keys=$keys",
        genScrambledCdc(n, keys, scramble = 800), batch) { in =>
        StreamOps.cdcApplyOrderedStream(
          in.toDS().withWatermark("ts", s"$slackS seconds")).toDF()
      }._2

    val slacks = Seq(1, 5, 20, 60)
    val keyCards = Seq(64, 1024, 16384)
    val rows =
      slacks.map(s => ("reorder_attrib", s, 1024, reorderChainRate(s, 1024))) ++
      keyCards.map(k => ("reorder_attrib", 20, k, reorderChainRate(20, k))) ++
      slacks.map(s => ("cdc_ordered", s, 1024, cdcOrderedRate(s, 1024))) ++
      keyCards.map(k => ("cdc_ordered", 20, k, cdcOrderedRate(20, k)))

    val json = rows.map { case (sc, s, k, r) =>
      String.format(Locale.ROOT,
        """{"scenario":"%s","slack_s":%d,"keys":%d,"eps":%.0f}""",
        sc, Int.box(s), Int.box(k), Double.box(r))
    }.mkString("[", ",", "]")
    println(s"""{"metric":"reorder_profile","unit":"events_per_sec",""" +
      s""""n":$n,"batch":$batch,"cpus":"$cpus","rows":$json}""")
    spark.stop()
  }
}
