package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, VectorOps}
import graft.streaming.StreamOps

/** [[StreamOps.indexMaintainStream]] — condition-driven maintenance:
  * the read-amplification bound (max live generations per cell) must
  * HOLD after every trigger, out-of-band tombstones must be folded
  * away by the next trigger, a hot batch must cause a split, and
  * through all of it the store's live contents must equal exactly the
  * fed corpus.
  */
class IndexMaintainSpec extends SparkSpec {

  private def dir(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_idxmaint_$name")
      .toString + "/idx"

  private def toIndexVecs(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    df.select($"vec_id", $"qv").as[(Long, Seq[Long])].collect()
      .map { case (id, v) => StreamOps.IndexVec(id, v.toArray) }.toSeq
  }

  private def maxLiveGens(d: String): Int =
    IvfIndex.readSnapshot(spark, d).cells.values
      .map(_.size).foldLeft(0)(math.max)

  private def liveIds(d: String): Set[Long] = {
    import spark.implicits._
    IvfIndex.liveContents(spark, d).select($"vec_id").as[Long]
      .collect().toSet
  }

  test("generation bound holds after every trigger; contents stay exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = VectorOps.quantized(spark, sfDir)
    val base = emb.filter($"vec_id" % 5 =!= 0)
    val d = dir("gens")
    IvfIndex.build(base, d)
    val feed = toIndexVecs(emb.filter($"vec_id" % 5 === 0))
    val batches = feed.grouped(math.max(1, feed.size / 8)).toSeq
    val in = MemoryStream[StreamOps.IndexVec]
    val q = StreamOps.indexMaintainStream(in.toDS(), d,
      maxGens = 3, splitHotCells = false)
    try {
      var fed = Set.empty[Long]
      batches.foreach { b =>
        in.addData(b); q.processAllAvailable()
        fed ++= b.map(_.vec_id)
        assert(maxLiveGens(d) <= 3,
          s"read-amplification bound violated: ${maxLiveGens(d)} live gens")
      }
      assert(batches.size > 3, "fixture too small to exercise the bound")
      val baseIds = base.select($"vec_id").as[Long].collect().toSet
      assert(liveIds(d) === baseIds ++ fed)
    } finally q.stop()
  }

  test("out-of-band tombstones are folded away by the next trigger") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = VectorOps.quantized(spark, sfDir)
    val d = dir("tombs")
    IvfIndex.build(emb.filter($"vec_id" % 5 =!= 0), d)
    val feed = toIndexVecs(emb.filter($"vec_id" % 5 === 0))
    val (b1, b2) = feed.splitAt(feed.size / 2)
    val in = MemoryStream[StreamOps.IndexVec]
    val q = StreamOps.indexMaintainStream(in.toDS(), d,
      maxGens = 8, maxTombs = 0, splitHotCells = false)
    try {
      in.addData(b1); q.processAllAvailable()
      // an out-of-band delete between triggers
      val victims = emb.filter($"vec_id" % 7 === 0 && $"vec_id" % 5 =!= 0)
        .select($"vec_id")
      IvfIndex.delete(spark, d, victims)
      assert(IvfIndex.readSnapshot(spark, d).tombs.nonEmpty)
      in.addData(b2); q.processAllAvailable()
      assert(IvfIndex.readSnapshot(spark, d).tombs.isEmpty,
        "pending tombstones must be compacted away by the next trigger")
      val vIds = victims.as[Long].collect().toSet
      assert(liveIds(d).intersect(vIds).isEmpty)
    } finally q.stop()
  }

  test("a hot batch triggers a split; contents survive re-homing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = VectorOps.quantized(spark, sfDir)
    val d = dir("split")
    IvfIndex.build(emb, d)
    val cellsBefore = IvfIndex.readSnapshot(spark, d).cells.keySet
    // a batch of near-clones of one stored vector: all land in one cell
    val hot = emb.orderBy($"vec_id").limit(1)
      .select($"qv").as[Seq[Long]].head()
    val maxId = emb.agg(max($"vec_id")).as[Long].head()
    val clones = (1L to (emb.count() / 4)).map(i =>
      StreamOps.IndexVec(maxId + i,
        hot.updated(0, hot.head + (i % 3)).toArray))
    val in = MemoryStream[StreamOps.IndexVec]
    val q = StreamOps.indexMaintainStream(in.toDS(), d,
      maxGens = 8, splitHotCells = true)
    try {
      val before = liveIds(d)
      in.addData(clones); q.processAllAvailable()
      val after = IvfIndex.readSnapshot(spark, d).cells.keySet
      assert(after.size > cellsBefore.size,
        s"hot cell was not split (cells: $cellsBefore -> $after)")
      assert(liveIds(d) === before ++ clones.map(_.vec_id))
    } finally q.stop()
  }
}
