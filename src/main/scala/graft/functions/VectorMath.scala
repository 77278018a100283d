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
