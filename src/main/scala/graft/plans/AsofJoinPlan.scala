package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a first-class operator (logical node + strategy + physical
  * merge), the whole-operator rung of the extension ladder: for every left
  * row, attach the LATEST right row of the same key with
  * `rightTime <= leftTime` (left outer — unmatched left rows keep nulls).
  *
  * The composed formulation ([[graft.ext.EventsExt.asofJoin]], union +
  * last_value window) is semantically identical but pays union-width rows
  * through ONE window sort over both inputs combined. This operator asks
  * Catalyst for hash co-partitioning on the key and a per-side
  * (key, time) sort — at scale that is the same exchange volume, but the
  * merge is a single forward pass with O(1) state (the one candidate row),
  * no window buffer, and each side sorts only its own columns.
  *
  * Key and time expressions must be LongType (ids / epoch micros) — the
  * builder in EventsExt validates; the merge compares raw longs, no
  * ordering allocation per row.
  *
  * Tie behavior: when several right rows share one exact (key, time), the
  * merge keeps whichever the per-side sort emitted LAST among them — the
  * required child ordering is (key, time) only, so that choice is
  * NONDETERMINISTIC across runs (same caveat as `last_value` over an
  * under-specified ordering; DuckDB's ASOF JOIN documents the same).
  * Callers needing determinism must make the right side's (key, time)
  * unique first (e.g. aggregate to one row per key+time).
  */
case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] to [[AsofJoinExec]]; injected via
  * [[GraftExtensions]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned, co-sorted streaming merge. Distribution/ordering
  * requirements mirror SortMergeJoin: EnsureRequirements inserts the hash
  * exchanges and per-partition sorts, AQE may satisfy them from reused
  * stages. Within a partition both iterators are (key, time)-ascending;
  * the right pointer advances monotonically and only the current best
  * candidate row is retained — no per-key buffering. */
case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lk = leftKey; val rk = rightKey; val lt = leftTime; val rt = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lktProj = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rktProj = UnsafeProjection.create(Seq(rk, rt), rOut)
      // bind the right side as NULLABLE: the outer-join null row feeds
      // positions whose child attrs may be non-null, and a non-nullable
      // BoundReference would skip the null check and read raw zeros
      val resultProj =
        UnsafeProjection.create(outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)

      // the upcoming right row (copied: execute() reuses row buffers) and
      // the best candidate so far for the current left key
      var nextR: InternalRow = null
      var nextRKey = 0L
      var nextRTime = 0L
      def advanceRight(): Unit = {
        nextR = null
        while (nextR == null && rIter.hasNext) {
          val r = rIter.next()
          val kt = rktProj(r)
          if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
            nextRKey = kt.getLong(0)
            nextRTime = kt.getLong(1)
            nextR = r.copy()
          }
        }
      }
      advanceRight()
      var lastR: InternalRow = null
      var lastRKey = 0L

      lIter.map { l =>
        val kt = lktProj(l)
        if (kt.isNullAt(0) || kt.isNullAt(1)) {
          resultProj(joined(l, nullRight))
        } else {
          val lKeyV = kt.getLong(0)
          val lTimeV = kt.getLong(1)
          while (nextR != null &&
            (nextRKey < lKeyV || (nextRKey == lKeyV && nextRTime <= lTimeV))) {
            lastR = nextR
            lastRKey = nextRKey
            advanceRight()
          }
          if (lastR != null && lastRKey == lKeyV) resultProj(joined(l, lastR))
          else resultProj(joined(l, nullRight))
        }
      }
    }
  }
}
