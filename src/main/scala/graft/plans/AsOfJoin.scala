package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Native as-of join — the canonical "operator Spark lacks" (the reference
  * corpus needs it nowhere, but DuckDB ships ASOF JOIN and our q52 composes
  * it from union+window). This is the whole-operator custom path from the
  * design rules: logical plan node + SparkStrategy + physical SparkPlan,
  * injectable via SparkSessionExtensions (GraftExtensions) or
  * spark.experimental.extraStrategies.
  *
  * Semantics (inner): each left row pairs with the LAST right row having an
  * equal key and right time ≤ left time; left rows with no such right row
  * are dropped. Equal-key/equal-time right duplicates resolve to the last
  * in (key, time) sort order — pre-deduplicate the right side if that
  * matters (q52 does).
  *
  * Scale design: both sides hash-partition on the key (one Exchange each,
  * same as any shuffled join) and sort within partitions on (key, time);
  * the merge itself is a single forward pass holding ONE buffered right
  * row — no per-key grouping, no window state, no full-partition
  * materialization. At 100 TB this is strictly less state than the
  * union+window formulation (which carries the window operator's buffer).
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans AsOfJoin into its physical merge implementation. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of: children clustered by key and sorted by (key, time);
  * a single-pass merge keeps the latest qualifying right row per key.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  // all three evaluate to Long (micros for the timestamp types); under a
  // UTC session TZ the NTZ/instant distinction does not affect ordering
  require(Seq(leftTime.dataType, rightTime.dataType).forall(
    t => t == TimestampType || t == TimestampNTZType || t == LongType),
    s"as-of time columns must be timestamp/long, got ${leftTime.dataType}/${rightTime.dataType}")

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyProjL = UnsafeProjection.create(lKeyExprs, lOut)
      val keyProjR = UnsafeProjection.create(rKeyExprs, rOut)
      val timeL = BindReferences.bindReference(lTimeExpr, lOut)
      val timeR = BindReferences.bindReference(rTimeExpr, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIter.buffered
      var cand: InternalRow = null
      var candKey: UnsafeRow = null
      lIter.flatMap { l =>
        val lKey = keyProjL(l)
        val lTBoxed = timeL.eval(l)
        // inner-join null semantics: a null key or null time never matches
        if (lKey.anyNull || lTBoxed == null) Iterator.empty
        else {
          val lT = lTBoxed.asInstanceOf[Long]
          // discard right rows keyed before the current left key — left keys
          // only grow, so they can never match again
          while (rBuf.hasNext && keyOrd.compare(keyProjR(rBuf.head), lKey) < 0)
            rBuf.next()
          // absorb equal-key rows up to the as-of time; the last one wins.
          // Rows with time > lT stay buffered for later (later lefts have
          // later times within the key). Null-keyed / null-timed right rows
          // are consumed and discarded — they can never join.
          var scanning = true
          while (scanning && rBuf.hasNext) {
            val head = rBuf.head
            val hKey = keyProjR(head)
            if (hKey.anyNull) { rBuf.next() }
            else if (keyOrd.compare(hKey, lKey) == 0) {
              val hT = timeR.eval(head)
              if (hT == null) { rBuf.next() }
              else if (hT.asInstanceOf[Long] <= lT) {
                cand = rBuf.next().copy()
                candKey = lKey.copy()
              } else scanning = false
            } else scanning = false
          }
          if (cand != null && candKey != null && keyOrd.compare(candKey, lKey) == 0)
            Iterator.single(resultProj(joined(l, cand)).asInstanceOf[InternalRow])
          else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Dataset-level API for the native as-of join. */
object AsOfJoinOp {

  /** Inner as-of join of `left` with `right` on equal `key`, matching the
    * last right row with `rightTimeCol` ≤ `leftTimeCol`. Column names must
    * be distinct across the two sides (standard join-attribute rule).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val spark = left.sparkSession
    // check-and-append under a lock: concurrent first calls must not
    // double-register (GraftExtensions-injected sessions already carry it)
    AsOfJoinOp.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lPlan = org.apache.spark.sql.GraftInternal.logicalPlan(left)
    val rPlan = org.apache.spark.sql.GraftInternal.logicalPlan(right)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}"))
    val node = AsOfJoin(lPlan, rPlan,
      Seq(attr(lPlan, leftKey)), Seq(attr(rPlan, rightKey)),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol))
    org.apache.spark.sql.GraftInternal.dataFrame(spark, node)
  }

  /** FORWARD as-of: each left row pairs with the FIRST right row having an
    * equal key and right time ≥ left time. Implemented by running the
    * backward merge on NEGATED epoch-micros — `-rt ≤ -lt ⇔ rt ≥ lt`, and
    * "last in ascending (key, −t)" is the smallest qualifying `rt`, i.e.
    * the first-after match — so the single-pass one-buffered-row exec is
    * reused unchanged. Timestamps (TZ or NTZ — the session runs UTC) go
    * through unix_micros; integral time columns negate directly.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTimeCol: String, rightTimeCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    def negMicros(df: DataFrame, c: String, out: String): DataFrame =
      df.schema(c).dataType match {
        case LongType => df.withColumn(out, -col(c))
        case _ => df.withColumn(out,
          expr(s"-unix_micros(CAST($c AS TIMESTAMP))"))
      }
    asofJoin(
        negMicros(left, leftTimeCol, "__neg_lt"),
        negMicros(right, rightTimeCol, "__neg_rt"),
        leftKey, rightKey, "__neg_lt", "__neg_rt")
      .drop("__neg_lt", "__neg_rt")
  }
}
