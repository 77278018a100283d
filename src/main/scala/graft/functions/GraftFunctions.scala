package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration for the graft expressions, usable two ways:
  *  - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *  - runtime: `GraftFunctions.register(spark)`
  * After either, SQL can call simhash64(arr), minhash_sig(arr, k, w),
  * winnow_fingerprints(arr, w), hyperplane_bucket(vec, nPlanes).
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> ((es: Seq[Expression]) => SimHash64Expr(es.head)),
    "minhash_sig" -> ((es: Seq[Expression]) =>
      MinHashSigExpr(es.head, intLit(es(1), "k"), intLit(es(2), "shingle"))),
    "winnow_fingerprints" -> ((es: Seq[Expression]) =>
      WinnowExpr(es.head, intLit(es(1), "window"))),
    "hyperplane_bucket" -> ((es: Seq[Expression]) =>
      HyperplaneBucketExpr(es.head, intLit(es(1), "nPlanes"))),
    "md5_minhash_sig" -> ((es: Seq[Expression]) =>
      Md5MinHashSigExpr(es.head, intLit(es(1), "k"))),
    "md5_simhash64" -> ((es: Seq[Expression]) => Md5SimHash64Expr(es.head)),
    "md5_winnow_fingerprints" -> ((es: Seq[Expression]) =>
      Md5WinnowExpr(es.head, intLit(es(1), "window"))),
    "sorted_intersect_size" -> ((es: Seq[Expression]) =>
      SortedIntersectSizeExpr(es.head, es(1)))
  )

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}

/** Injection point for spark.sql.extensions: SQL functions + the native
  * as-of join planner strategy.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.InequalityJoinStrategy)
    // plain joins with two pure inequality predicates (API or SQL text)
    // transparently become the native IEJoin-style operator
    ext.injectOptimizerRule(_ => graft.plans.InequalityJoinRewrite)
  }
}
