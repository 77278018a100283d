package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native inequality join (IEJoin-style) — inner join on TWO inequality
  * predicates and nothing else: `l.x ⋈x r.x AND l.y ⋈y r.y` with
  * ⋈ ∈ {<, <=, >, >=}. The reference corpus never needs this shape
  * (its joins are equi + residual BETWEEN — SURVEY §2.3), but Spark plans
  * it as BroadcastNestedLoopJoin / CartesianProduct, i.e. O(|L|·|R|)
  * compute per pair of partitions. This operator keeps the SAME data
  * movement as Spark's broadcast BNLJ (small side broadcast once) but
  * replaces the quadratic per-partition probe with a sweep in the style
  * of IEJoin (Khayyat et al., VLDB 2015): sort both sides on x, sweep the
  * broadcast side while inserting left rows into an order-statistics tree
  * keyed by y, and enumerate each r's matches from the tree's head/tail
  * view — O((|L_p| + |R|)·log|L_p| + output) per partition.
  *
  * Scale design: broadcast the SMALL side (as with any broadcast join at
  * 100 TB); the big side streams through executors partition-by-partition
  * with per-partition memory O(|L_p|) for the tree. Null x/y on either
  * side never matches (inner-join null semantics).
  */
case class InequalityJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftX: Expression, opX: String, rightX: Expression,
    leftY: Expression, opY: String, rightY: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): InequalityJoin =
    copy(left = newLeft, right = newRight)
}

object InequalityJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case InequalityJoin(l, r, lx, ox, rx, ly, oy, ry) =>
      InequalityJoinExec(lx, ox, rx, ly, oy, ry, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class InequalityJoinExec(
    leftX: Expression, opX: String, rightX: Expression,
    leftY: Expression, opY: String, rightY: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  private val ValidOps = Set("<", "<=", ">", ">=")
  require(ValidOps(opX) && ValidOps(opY), s"ops must be one of $ValidOps")
  require(leftX.dataType == rightX.dataType && leftY.dataType == rightY.dataType,
    s"predicate column types must match: ${leftX.dataType}/${rightX.dataType}, " +
      s"${leftY.dataType}/${rightY.dataType}")

  override def output: Seq[Attribute] = left.output ++ right.output
  override def outputPartitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val ordX = TypeUtils.getInterpretedOrdering(leftX.dataType)
    val ordY = TypeUtils.getInterpretedOrdering(leftY.dataType)
    val rxBound = BindReferences.bindReference(rightX, right.output)
    val ryBound = BindReferences.bindReference(rightY, right.output)
    // x-sweep direction: the inserted-left set must only GROW as we walk
    // the right rows, so for l.x < r.x sweep r ascending, for l.x > r.x
    // descending; strictness is applied at insert time.
    val ascX = opX == "<" || opX == "<="
    val strictX = opX == "<" || opX == ">"
    // driver-side: drop right rows that can never match, precompute their
    // (x, y) and sort once before broadcasting
    val rRows = right.executeCollect().flatMap { r =>
      val x = rxBound.eval(r)
      val y = ryBound.eval(r)
      if (x == null || y == null) None else Some((x, y, r))
    }
    val rSorted = rRows.sortWith { (a, b) =>
      if (ascX) ordX.lt(a._1, b._1) else ordX.gt(a._1, b._1)
    }
    val bc = sparkContext.broadcast(rSorted)
    val lOut = left.output
    val lxExpr = leftX
    val lyExpr = leftY
    val outAttrs = output
    val oy = opY
    left.execute().mapPartitions { lIter =>
      val lxBound = BindReferences.bindReference(lxExpr, lOut)
      val lyBound = BindReferences.bindReference(lyExpr, lOut)
      val lRows = lIter.flatMap { l =>
        val x = lxBound.eval(l)
        val y = lyBound.eval(l)
        if (x == null || y == null) None else Some((x, y, l.copy()))
      }.toArray
      if (lRows.isEmpty) Iterator.empty
      else {
        java.util.Arrays.sort(lRows, new java.util.Comparator[(Any, Any, InternalRow)] {
          override def compare(a: (Any, Any, InternalRow), b: (Any, Any, InternalRow)): Int =
            if (ascX) ordX.compare(a._1, b._1) else ordX.compare(b._1, a._1)
        })
        val tree = new java.util.TreeMap[Any, scala.collection.mutable.ArrayBuffer[InternalRow]](
          new java.util.Comparator[Any] {
            override def compare(a: Any, b: Any): Int = ordY.compare(a, b)
          })
        val joined = new JoinedRow
        val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
        var li = 0
        bc.value.iterator.flatMap { case (rx, ry, r) =>
          // insert every left row whose x satisfies the x-predicate vs rx
          var inserting = true
          while (inserting && li < lRows.length) {
            val entry = lRows(li)
            val c = ordX.compare(entry._1, rx)
            val ok = if (ascX) { if (strictX) c < 0 else c <= 0 }
                     else      { if (strictX) c > 0 else c >= 0 }
            if (ok) {
              var buf = tree.get(entry._2)
              if (buf == null) {
                buf = new scala.collection.mutable.ArrayBuffer[InternalRow](1)
                tree.put(entry._2, buf)
              }
              buf += entry._3
              li += 1
            } else inserting = false
          }
          // enumerate left rows whose y satisfies the y-predicate vs ry
          val view = oy match {
            case ">"  => tree.tailMap(ry, false)
            case ">=" => tree.tailMap(ry, true)
            case "<"  => tree.headMap(ry, false)
            case "<=" => tree.headMap(ry, true)
          }
          import scala.jdk.CollectionConverters._
          view.values.asScala.iterator.flatten.map { l =>
            resultProj(joined(l, r)).asInstanceOf[InternalRow]
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): InequalityJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: transparently rewrites an INNER join whose condition
  * is exactly two pure inequality predicates (and no equi predicate —
  * with one, Spark's hash joins are already right) into the native
  * [[InequalityJoin]], provided the right side is broadcast-small (same
  * statistics gate as Spark's own broadcast decision). With this rule a
  * user writes plain `a.join(b, a("x") < b("x") && a("y") > b("y"))` —
  * or the equivalent SQL text — and gets the IEJoin-style sweep instead
  * of BroadcastNestedLoopJoin's quadratic probe.
  */
object InequalityJoinRewrite
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  import org.apache.spark.sql.catalyst.expressions.{GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
  import org.apache.spark.sql.catalyst.plans.Inner
  import org.apache.spark.sql.catalyst.plans.logical.Join

  private def flip(op: String): String = op match {
    case "<" => ">" case "<=" => ">=" case ">" => "<" case ">=" => "<="
  }

  /** Orient one comparison as (leftSideExpr, op, rightSideExpr); None if
    * it straddles sides or isn't a plain inequality.
    */
  private def orient(e: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(Expression, String, Expression)] = {
    val parts = e match {
      case LessThan(a, b) => Some((a, "<", b))
      case LessThanOrEqual(a, b) => Some((a, "<=", b))
      case GreaterThan(a, b) => Some((a, ">", b))
      case GreaterThanOrEqual(a, b) => Some((a, ">=", b))
      case _ => None
    }
    parts.flatMap { case (a, op, b) =>
      if (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet))
        Some((a, op, b))
      else if (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
        Some((b, flip(op), a))
      else None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(l, r, Inner, Some(cond), _)
        if r.stats.sizeInBytes >= 0 &&
          r.stats.sizeInBytes <= conf.autoBroadcastJoinThreshold =>
      splitConjunctivePredicates(cond) match {
        case Seq(c1, c2) =>
          (orient(c1, l, r), orient(c2, l, r)) match {
            case (Some((lx, ox, rx)), Some((ly, oy, ry)))
                if lx.dataType == rx.dataType && ly.dataType == ry.dataType =>
              InequalityJoin(l, r, lx, ox, rx, ly, oy, ry)
            case _ => j
          }
        case _ => j
      }
  }
}

/** Dataset-level API for the native inequality join. */
object InequalityJoinOp {

  /** Inner join of `left` with `right` on exactly two inequality
    * predicates, given as (leftCol, op, rightCol) with op in
    * {"<", "<=", ">", ">="}. The RIGHT side is broadcast — pass the small
    * relation there. Column names must be distinct across the two sides.
    */
  def ieJoin(left: DataFrame, right: DataFrame,
      condX: (String, String, String),
      condY: (String, String, String)): DataFrame = {
    val spark = left.sparkSession
    InequalityJoinOp.synchronized {
      if (!spark.experimental.extraStrategies.contains(InequalityJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ InequalityJoinStrategy
    }
    val lPlan = org.apache.spark.sql.GraftInternal.logicalPlan(left)
    val rPlan = org.apache.spark.sql.GraftInternal.logicalPlan(right)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}"))
    val node = InequalityJoin(lPlan, rPlan,
      attr(lPlan, condX._1), condX._2, attr(rPlan, condX._3),
      attr(lPlan, condY._1), condY._2, attr(rPlan, condY._3))
    org.apache.spark.sql.GraftInternal.dataFrame(spark, node)
  }
}
