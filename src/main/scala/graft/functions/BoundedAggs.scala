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

object BoundedAggs {
  /** DataFrame-usable column function: k smallest longs per group, csv. */
  def kSmallest(col: Column, k: Int): Column =
    udaf(new KSmallest(k), Encoders.scalaLong).apply(col)
}
