package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane (sign-LSH) bucketing for embedding vectors.
  *
  * Per-row compute: the ±1 hyperplane family is derived from splitmix64
  * of (plane, dim) — no stored model, identical on every executor. At
  * 100 TB this keeps ANN candidate generation a map-side projection; the
  * only shuffle is the (bucket → candidates) join.
  */
object VectorHashes {

  /** Bucket id in [0, 2^nPlanes) from sign bits of v·plane_p. */
  def hyperplaneBucket(v: Column, nPlanes: Int): Column =
    column(HyperplaneBucketExpr(expression(v), nPlanes))

  private[graft] def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** ±1 entry of plane p at dimension i (deterministic). */
  private[graft] def planeSign(p: Int, i: Int): Double =
    if ((mix(p.toLong * 1000003L + i.toLong) & 1L) == 1L) 1.0 else -1.0

  def bucketScala(v: Seq[Double], nPlanes: Int): Long = {
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += planeSign(p, i) * v(i); i += 1 }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Buckets at Hamming distance ≤ 1 from b (multi-probe LSH). */
  def probeBuckets(b: Long, nPlanes: Int): Seq[Long] =
    b +: (0 until nPlanes).map(p => b ^ (1L << p))

  /** ArrayData entry points for generated code. */
  def bucketFromFloatArrayData(arr: ArrayData, nPlanes: Int): Long =
    bucketScala(arr.toFloatArray().toSeq.map(_.toDouble), nPlanes)

  def bucketFromDoubleArrayData(arr: ArrayData, nPlanes: Int): Long =
    bucketScala(arr.toDoubleArray().toSeq, nPlanes)
}

/** array<double> (or array<float>) → long bucket id. */
case class HyperplaneBucketExpr(child: Expression, nPlanes: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => true
      case DoubleType => false
      case other => throw new IllegalArgumentException(s"unsupported $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (isFloat) VectorHashes.bucketFromFloatArrayData(arr, nPlanes)
    else VectorHashes.bucketFromDoubleArrayData(arr, nPlanes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "bucketFromFloatArrayData" else "bucketFromDoubleArrayData"
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorHashes.$fn($c, $nPlanes)")
  }

  override def prettyName: String = "hyperplane_bucket"
  override protected def withNewChildInternal(c: Expression): HyperplaneBucketExpr = copy(child = c)
}
