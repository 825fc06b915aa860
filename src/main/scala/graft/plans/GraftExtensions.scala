package graft.plans

import org.apache.spark.sql.graft.SortedIntersectCount
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point — registers graft's native functions
  * into the session FunctionRegistry so plain SQL can call them:
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *   SELECT sorted_intersect_count(a, b) ...
  *
  * (DataFrame code paths don't need the registry — they wrap the Expression
  * directly via GraftColumnBridge.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-plan rewrite: abs(a-b) <= W theta joins become banded equi-joins
    ext.injectOptimizerRule(_ => BandedRangeJoinRule)
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (children: Seq[Expression]) =>
        SortedIntersectCount(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("fvec_dot"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.FloatVecDot].getName, "fvec_dot"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.graft.FloatVecDot(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.WinnowFingerprints].getName,
        "winnow_fingerprints"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.graft.WinnowFingerprints(children.head)))
  }
}
