package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused per-row vector arithmetic for the similarity/clustering surface
  * (q37/q60 cosine, q72/q85 assignment, q90 PQ encode+ADC).
  *
  * The higher-order-function formulation `aggregate(zip_with(a, b, …))`
  * is semantically right but (a) materializes the element-wise product
  * array per row and (b) evaluates the lambda through non-codegen
  * interpreted expressions — per-element closure dispatch inside the
  * hottest loop of the engine. These expressions compute the same fold
  * in one primitive loop and splice into whole-stage codegen via
  * `defineCodeGen`, so the N×k distance scan stays a tight JIT'd loop.
  *
  * Determinism: the loop accumulates LEFT-TO-RIGHT in the same order as
  * `aggregate`'s sequential fold — per element, multiply (one IEEE
  * rounding) then add (one IEEE rounding), no FMA — so results are
  * bit-identical to the HOF formulation and the DuckDB oracles'
  * `list_sum(list_transform(list_zip(…)))` replay.
  */
object VectorMath {

  /** Σ (aᵢ−bᵢ)² over two array<long> — exact int64 squared L2. */
  def sqDistLong(a: Column, b: Column): Column =
    column(SqDistLongExpr(expression(a), expression(b)))

  /** Σ aᵢ·bᵢ over two array<double> — left-to-right fold. */
  def dotDouble(a: Column, b: Column): Column =
    column(DotDoubleExpr(expression(a), expression(b)))

  /** Σ aᵢ·bᵢ over two array<long> — exact int64 dot (q93 semantic dedup). */
  def dotLong(a: Column, b: Column): Column =
    column(DotLongExpr(expression(a), expression(b)))

  /** PQ encode: 64-long vector × 8-subspace codebook
    * (array<array<array<long>>>) → the packed 4-bit-per-subspace code
    * long. Argmin ties break to the LOWEST code index (strict `<`),
    * matching the oracle's (distance, code) order.
    */
  def pqEncode(qv: Column, codebook: Column): Column =
    column(PqEncodeExpr(expression(qv), expression(codebook)))

  /** PQ asymmetric distance: per-query lookup table
    * (array<array<long>>, 8×nCodes) × packed code long → Σ of the 8
    * addressed entries — exact int64, equal to the reconstruction
    * distance because squared L2 decomposes over disjoint subspaces.
    */
  def pqAdc(lut: Column, code: Column): Column =
    column(PqAdcExpr(expression(lut), expression(code)))

  /** Per-(query, probed cell) residual ADC lookup table: query vector ×
    * cell centroid (both array<long>(64)) × codebook
    * (array<array<array<long>>>, 8×nCodes×8) → array<array<long>>
    * (8×nCodes) of exact int64 residual-space distances
    * lut[m][c] = Σᵢ ((qvᵢ − cqᵢ) − cbᵢ)². One fused JIT'd loop — the
    * HOF formulation re-evaluates the interpreted residual zip_with
    * under every one of the 8×nCodes table cells.
    */
  def pqLut(qv: Column, cq: Column, codebook: Column): Column =
    column(PqLutExpr(expression(qv), expression(cq), expression(codebook)))

  def sqDistLongFromArrayData(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0L
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  def dotLongFromArrayData(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0L
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  def dotDoubleFromArrayData(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0.0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  def pqEncodeFromArrayData(qv: ArrayData, cb: ArrayData): Long = {
    var packed = 0L
    var m = 0
    while (m < 8) {
      val codes = cb.getArray(m)
      val n = codes.numElements()
      var best = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < n) {
        val cv = codes.getArray(c)
        var s = 0L
        var i = 0
        while (i < 8) {
          val d = qv.getLong(m * 8 + i) - cv.getLong(i)
          s += d * d
          i += 1
        }
        if (s < best) { best = s; bestC = c }
        c += 1
      }
      packed += bestC.toLong << (4 * m)
      m += 1
    }
    packed
  }

  def pqLutFromArrayData(qv: ArrayData, cq: ArrayData,
      cb: ArrayData): ArrayData = {
    val out = new Array[Any](8)
    var m = 0
    while (m < 8) {
      val codes = cb.getArray(m)
      val n = codes.numElements()
      val row = new Array[Long](n)
      var c = 0
      while (c < n) {
        val cv = codes.getArray(c)
        var s = 0L
        var i = 0
        while (i < 8) {
          val d = qv.getLong(m * 8 + i) - cq.getLong(m * 8 + i) -
            cv.getLong(i)
          s += d * d
          i += 1
        }
        row(c) = s
        c += 1
      }
      out(m) =
        new org.apache.spark.sql.catalyst.util.GenericArrayData(row)
      m += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def pqAdcFromArrayData(lut: ArrayData, code: Long): Long = {
    var m = 0
    var s = 0L
    while (m < 8) {
      s += lut.getArray(m).getLong(((code >>> (4 * m)) & 15L).toInt)
      m += 1
    }
    s
  }
}

/** array<long> × array<long> → long: Σ (aᵢ−bᵢ)². */
case class SqDistLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.sqDistLongFromArrayData(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMath.sqDistLongFromArrayData($a, $b)")
  override def prettyName: String = "sq_dist_long"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SqDistLongExpr = copy(left = l, right = r)
}

/** array<long> × array<long> → long: Σ aᵢ·bᵢ. */
case class DotLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dotLongFromArrayData(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMath.dotLongFromArrayData($a, $b)")
  override def prettyName: String = "dot_long"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotLongExpr = copy(left = l, right = r)
}

/** array<double> × array<double> → double: Σ aᵢ·bᵢ. */
case class DotDoubleExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dotDoubleFromArrayData(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMath.dotDoubleFromArrayData($a, $b)")
  override def prettyName: String = "dot_double"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotDoubleExpr = copy(left = l, right = r)
}

/** array<long>(64) × array<array<array<long>>>(8×n×8) → packed code long. */
case class PqEncodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.pqEncodeFromArrayData(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMath.pqEncodeFromArrayData($a, $b)")
  override def prettyName: String = "pq_encode"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqEncodeExpr = copy(left = l, right = r)
}

/** qv(64) × cq(64) × codebook(8×n×8) → array<array<long>> residual LUT. */
case class PqLutExpr(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = ArrayType(ArrayType(LongType))
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    VectorMath.pqLutFromArrayData(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.VectorMath.pqLutFromArrayData($a, $b, $c)")
  override def prettyName: String = "pq_lut"
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): PqLutExpr =
    copy(first = f, second = s, third = t)
}

/** array<array<long>>(8×n) × long → long: Σ of the 8 addressed entries. */
case class PqAdcExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.pqAdcFromArrayData(
      a.asInstanceOf[ArrayData], b.asInstanceOf[java.lang.Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorMath.pqAdcFromArrayData($a, $b)")
  override def prettyName: String = "pq_adc"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqAdcExpr = copy(left = l, right = r)
}
