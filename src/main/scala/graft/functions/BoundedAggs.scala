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

object BoundedAggs {
  /** DataFrame-usable column function: k smallest longs per group, csv. */
  def kSmallest(col: Column, k: Int): Column =
    udaf(new KSmallest(k), Encoders.scalaLong).apply(col)

  /** Element-wise sum of array<bigint> columns per group. */
  def vecSum(col: Column): Column =
    udaf(new VecSum,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
      .apply(col)
}
