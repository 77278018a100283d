package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-state buffer for [[KSmallest]] (public: product encoder). */
case class KSmallBuf(values: Array[Long])

/** Typed `Aggregator[IN, BUF, OUT]` demo — the design-rule path for
  * custom aggregations (SURVEY §2.10): k smallest values per group with
  * a BOUNDED buffer. Unlike the window-function top-k (sort all rows per
  * group), the state is O(k) per group and the partial buffers merge
  * associatively, so Spark runs it as a two-phase aggregate with
  * map-side combine — the same partial/final split the reference forces
  * at its stage boundaries (SURVEY §2.4).
  *
  * Output is the sorted csv of the k smallest — a string, not an array,
  * so the DuckDB oracle compares a scalar column.
  */
class KSmallest(k: Int) extends Aggregator[Long, KSmallBuf, String] {

  override def zero: KSmallBuf = KSmallBuf(Array.empty)

  private def bounded(sorted: Array[Long]): KSmallBuf =
    KSmallBuf(if (sorted.length > k) sorted.take(k) else sorted)

  override def reduce(b: KSmallBuf, a: Long): KSmallBuf = {
    if (b.values.length == k && a >= b.values(k - 1)) b
    else {
      val merged = (b.values :+ a)
      java.util.Arrays.sort(merged)
      bounded(merged)
    }
  }

  override def merge(b1: KSmallBuf, b2: KSmallBuf): KSmallBuf = {
    val merged = b1.values ++ b2.values
    java.util.Arrays.sort(merged)
    bounded(merged)
  }

  override def finish(b: KSmallBuf): String = b.values.mkString(",")

  override def bufferEncoder: Encoder[KSmallBuf] = Encoders.product[KSmallBuf]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

/** Buffer for [[VecSum]] — the running element-wise sum. */
case class VecSumBuf(values: Array[Long])

/** Element-wise sum of fixed-dimension long vectors — the centroid-update
  * primitive of a distributed Lloyd iteration (PipelineOps q85). State is
  * O(dim) per group and partial buffers merge associatively (element-wise
  * add), so Spark runs it as a two-phase HashAggregate with map-side
  * combine: the shuffle carries one dim-length array per (partition ×
  * centroid), never one row per (vector × dimension) — the posexplode
  * formulation would shuffle N×dim rows.
  */
class VecSum extends Aggregator[Seq[Long], VecSumBuf, Seq[Long]] {

  override def zero: VecSumBuf = VecSumBuf(Array.empty)

  private def add(a: Array[Long], b: Seq[Long]): Array[Long] =
    if (a.isEmpty) b.toArray
    else {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def reduce(b: VecSumBuf, v: Seq[Long]): VecSumBuf =
    if (v == null) b else VecSumBuf(add(b.values, v))

  override def merge(b1: VecSumBuf, b2: VecSumBuf): VecSumBuf =
    VecSumBuf(add(b1.values, b2.values.toSeq))

  override def finish(b: VecSumBuf): Seq[Long] = b.values.toSeq

  override def bufferEncoder: Encoder[VecSumBuf] = Encoders.product[VecSumBuf]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Input row for [[KTopScored]] (public: product encoder — the udaf
  * surface takes the three fields as separate columns; `keep` filters
  * inside the aggregate so callers never feed nullable structs).
  */
case class ScoredIn(score: Double, id: Long, keep: Boolean)

/** Output element of [[KTopScored]]. */
case class ScoredId(score: Double, id: Long)

/** Buffer for [[KTopScored]] — parallel arrays kept sorted by
  * (score desc, id asc), truncated at k.
  */
case class TopScoredBuf(scores: Array[Double], ids: Array[Long])

/** Top-k (score, id) pairs per group by (score desc, id asc) with a
  * BOUNDED O(k) buffer. The window-function form of a per-group top-k
  * shuffles and sorts every candidate row; this aggregator folds each
  * map task's candidates down to k rows before the exchange, so the
  * shuffle carries O(groups × k × tasks) instead of the candidate
  * relation (the same partial/final split as [[KSmallest]], at the
  * cardinality that matters for ANN mining — q142 keeps 3 rows per
  * query where its candidate relation is cells × cell-size).
  * Deterministic: id is unique per group, so the order is total.
  *
  * NaN scores are DROPPED inside the aggregate (a NaN cosine means a
  * zero-norm vector — 0/0 — and "NaN is the best match" is never the
  * mining semantic). Note this intentionally differs from the window
  * form it replaces: Spark's `orderBy(desc)` sorts NaN as LARGEST, so a
  * NaN-scored row would win a rank-1 window; here it is excluded, which
  * also keeps the Scala-side comparisons (where NaN answers false to
  * every `<`/`==`) from silently disagreeing with the sort order.
  */
class KTopScored(k: Int)
    extends Aggregator[ScoredIn, TopScoredBuf, Seq[ScoredId]] {

  override def zero: TopScoredBuf = TopScoredBuf(Array.empty, Array.empty)

  private def worseThanLast(b: TopScoredBuf, score: Double, id: Long): Boolean = {
    val last = b.scores.length - 1
    score < b.scores(last) || (score == b.scores(last) && id > b.ids(last))
  }

  private def rebuild(pairs: Array[(Double, Long)]): TopScoredBuf = {
    val sorted = pairs.sortBy { case (s, i) => (-s, i) }
    val kept = if (sorted.length > k) sorted.take(k) else sorted
    TopScoredBuf(kept.map(_._1), kept.map(_._2))
  }

  override def reduce(b: TopScoredBuf, a: ScoredIn): TopScoredBuf =
    if (a == null || !a.keep || a.score.isNaN) b
    else if (b.scores.length == k && worseThanLast(b, a.score, a.id)) b
    else rebuild(b.scores.zip(b.ids) :+ (a.score, a.id))

  override def merge(b1: TopScoredBuf, b2: TopScoredBuf): TopScoredBuf =
    if (b2.scores.isEmpty) b1
    else if (b1.scores.isEmpty) b2
    else rebuild(b1.scores.zip(b1.ids) ++ b2.scores.zip(b2.ids))

  override def finish(b: TopScoredBuf): Seq[ScoredId] =
    b.scores.zip(b.ids).map { case (s, i) => ScoredId(s, i) }.toSeq

  override def bufferEncoder: Encoder[TopScoredBuf] =
    Encoders.product[TopScoredBuf]
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}

object BoundedAggs {
  /** DataFrame-usable column function: k smallest longs per group, csv. */
  def kSmallest(col: Column, k: Int): Column =
    udaf(new KSmallest(k), Encoders.scalaLong).apply(col)

  /** Element-wise sum of array<bigint> columns per group. */
  def vecSum(col: Column): Column =
    udaf(new VecSum,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
      .apply(col)

  /** Top-k (score: double, id: bigint) rows per group by
    * (score desc, id asc); rows with keep = false or a NaN score are
    * skipped inside the aggregate. Returns the sorted
    * array<struct<score, id>> (possibly shorter than k, possibly empty).
    */
  def topScored(score: Column, id: Column, keep: Column, k: Int): Column =
    udaf(new KTopScored(k), Encoders.product[ScoredIn]).apply(score, id, keep)
}
