package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED binary-quantization tier — the serving form of q191's
  * two-stage plan, the layout every modern vector store ships beside
  * its full-precision postings (a 1-bit sidecar scanned first, the
  * float tier touched only for the shortlist):
  *
  *   - `codes/`   (vec_id, w0, w1): the 16-logical-byte tier. Stage 1
  *     reads ONLY this relation — at 1B vectors it is 16 GB against
  *     the float tier's 256 GB, and the scan is two xor+popcount per
  *     candidate.
  *   - `vectors/` bucket=…/ (vec_id, qv): full-precision vectors
  *     partitioned by a 64-way id bucket. The refine fetch collects
  *     the shortlist's bucket set (≤ 64 values, driver-bounded) and
  *     pushes it as a partition filter, so a small serving batch
  *     reads a handful of directories — the IvfIndex probe-list
  *     discipline applied to the refine side.
  *
  * Serve shares q191's stage code verbatim ([[VectorOps.hamShortlist]]
  * / [[VectorOps.refineRank]]), so store-serve equality is by
  * construction and the q195 gate entry hashes the stored serve
  * against q191's own oracle. The store is IMMUTABLE (build-once;
  * rebuild to refresh) — the mutation lifecycle lives on [[IvfIndex]];
  * this tier is what a release rebuild materializes beside the PQ
  * store when the serving fleet is scan-bound rather than
  * recall-bound.
  *
  * Scale: the build is one code-pack map pass plus two writes (the
  * vectors write repartitions on bucket — one file per directory, the
  * q156 small-files lesson); a serve is the codes scan folding
  * map-side to `width` rows per query plus a bucket-pruned fetch of
  * shortlist ids only. Nothing driver-sized but the bucket list.
  */
object BinaryStore {

  /** Refine-side fan-out: vectors partition into this many id buckets. */
  val Buckets = 64L

  /** Build the store from a quantized corpus (vec_id, qv). */
  def build(emb: DataFrame, dir: String): Unit = {
    val s = emb.sparkSession
    import s.implicits._
    VectorOps.binaryCodes(emb)
      .select($"vec_id", $"w0", $"w1")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/codes")
    emb.select($"vec_id", $"qv", pmod($"vec_id", lit(Buckets)).as("bucket"))
      .repartition($"bucket")
      .write.mode(SaveMode.Overwrite).partitionBy("bucket")
      .parquet(s"$dir/vectors")
  }

  /** Two-stage serve from the stored relations for a query batch
    * (query_id, q_qv, qw0, qw1): returns (shortlist, refined) — the
    * q191 stage shapes, so any consumer (the gate report, a top-k
    * take of rrank <= k) composes identically on either source.
    */
  def serveStages(s: SparkSession, dir: String, queries: DataFrame,
      width: Int): (DataFrame, DataFrame) = {
    import s.implicits._
    val codes = s.read.parquet(s"$dir/codes")
    val shortlist = VectorOps.hamShortlist(codes, queries, width)
    // the shortlist is checkpointed and |queries|·width rows — the
    // bucket set is a driver-bounded (≤ Buckets) partition filter
    val buckets = shortlist
      .select(pmod($"neighbor", lit(Buckets)).as("bucket"))
      .distinct().as[Long].collect().toSeq
    val vecs = s.read.parquet(s"$dir/vectors")
      .filter($"bucket".isin(buckets: _*))
    (shortlist, VectorOps.refineRank(shortlist, vecs, queries))
  }

  /** The store is IMMUTABLE, so a serving loop can pin both relations
    * in memory once per (session, dir) — the [[IvfIndex]] serve-cache
    * move without the epoch key (there are no epochs to invalidate).
    * With the relations cached, the per-trigger bucket collect buys
    * nothing (partition pruning is a DISK win), so the cached path
    * skips that extra action: one job per trigger instead of three.
    */
  private val relCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      (DataFrame, DataFrame)]()

  def serveStagesCached(s: SparkSession, dir: String, queries: DataFrame,
      width: Int): (DataFrame, DataFrame) = {
    val (codes, vecs) = relCache.computeIfAbsent((s, dir), _ =>
      (s.read.parquet(s"$dir/codes").localCheckpoint(true),
        s.read.parquet(s"$dir/vectors").localCheckpoint(true)))
    val shortlist = VectorOps.hamShortlist(codes, queries, width)
    (shortlist, VectorOps.refineRank(shortlist, vecs, queries))
  }

  /** Ranked top-k from the stored index — the plain serving surface.
    * `cached = true` pins the immutable relations in memory for a
    * serving loop (the streaming path); the rows are identical either
    * way (spec-pinned).
    */
  def serve(s: SparkSession, dir: String, queries: DataFrame, k: Int,
      width: Int = 20, cached: Boolean = false): DataFrame = {
    import s.implicits._
    val (_, refined) =
      if (cached) serveStagesCached(s, dir, queries, width)
      else serveStages(s, dir, queries, width)
    refined.filter($"rrank" <= k)
      .select($"query_id", $"rrank".as("rank"), $"neighbor", $"dist")
      .orderBy($"query_id", $"rank")
  }
}
