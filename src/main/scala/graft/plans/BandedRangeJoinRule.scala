package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DayTimeIntervalType, DoubleType, FloatType, IntegerType, LongType, ShortType, TimestampType}

/** Optimizer rule: rewrite a theta join whose condition contains a band
  * predicate — `abs(a - b) <= W`, a two-sided bound pair in any of the
  * `<=`/`<`/`>=`/`>` spellings, or the TIMESTAMP form
  * `t BETWEEN t2 - INTERVAL W AND t2 + INTERVAL W` (a from one side, b
  * from the other, W a literal) — into a banded EQUI-join. Operands may be
  * integral (bins via truncating integer division), TIMESTAMP (compared as
  * epoch micros), or float/double (bins via `floor(x / W)` — scale and
  * truncate; |a−b| ≤ W still puts b's bin within a's bin ± 1).
  *
  * Spark plans the raw predicate as BroadcastNestedLoopJoin — or, with an
  * accompanying equi key, still fans out to every same-key pair before
  * filtering. The rewrite buckets both sides into W-wide bins
  * (`a div W` / `b div W`): the probe side explodes to bin-1/bin/bin+1 and
  * the join gains `lbin = rbin` as an equi conjunct, so the planner picks a
  * hash/merge join whose fan-out is bounded by rows-per-key-per-window.
  * Truncating division keeps the rewrite sound for negative values too:
  * bin 0 simply spans (-W, W), and wider bins only admit extra candidates —
  * the original predicate stays in the join condition as the exact filter.
  * A top-level Project restores the original output (the bin columns are
  * internal).
  *
  * Known divergence (documented, not guarded): under non-ANSI mode the
  * ORIGINAL predicate `a - b <= W` silently wraps on Long overflow and can
  * accept pairs whose true distance is astronomically large; the rewritten
  * plan's bin-adjacency conjunct prunes those pairs, so for operand
  * magnitudes within 2⁶³⁻¹ of each other the rewrite returns the
  * mathematically-correct band while the unrewritten plan returns the
  * wrapped one. Keys of that magnitude are ill-formed inputs for a band
  * join (ANSI mode errors on them); the rewrite sides with arithmetic over
  * wraparound.
  *
  * This is the composed form of `EventsExt.bandedRangeCount`, applied
  * automatically by Catalyst so plain `abs(l.t - r.t) <= W` SQL/DataFrame
  * joins scale without the caller knowing the trick. Injected via
  * [[GraftExtensions]]; idempotent (a probe side already banded by this
  * rule is skipped).
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val BinPrefix = "graft_band_bin"

  /** Band width, tagged with the binning arithmetic its operand type
    * needs: integral/timestamp widths bin by truncating integer division,
    * fractional widths by floor-of-division. */
  private sealed trait Width { def value: Double }
  private case class IntW(w: Long) extends Width { def value: Double = w.toDouble }
  private case class FracW(w: Double) extends Width { def value: Double = w }

  private def integralValue(l: Literal): Option[Long] = l match {
    case Literal(v: Byte, ByteType)   => Some(v.toLong)
    case Literal(v: Short, ShortType) => Some(v.toLong)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType)   => Some(v)
    case _                            => None
  }

  private def fractionalValue(l: Literal): Option[Double] = l match {
    case Literal(v: Float, FloatType)   => Some(v.toDouble)
    case Literal(v: Double, DoubleType) => Some(v)
    case _                              => None
  }

  private def isIntegral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _                                             => false
  }

  private def isFractional(e: Expression): Boolean = e.dataType match {
    case FloatType | DoubleType => true
    case _                      => false
  }

  /** (leftSideExpr, rightSideExpr) if a/b split cleanly across the join. */
  private def sides(a: Expression, b: Expression, left: LogicalPlan,
                    right: LogicalPlan): Option[(Expression, Expression)] =
    if (a.references.subsetOf(left.outputSet) &&
      b.references.subsetOf(right.outputSet)) Some((a, b))
    else if (b.references.subsetOf(left.outputSet) &&
      a.references.subsetOf(right.outputSet)) Some((b, a))
    else None

  /** The probe side of a rewritten join keeps its bin attribute in scope
    * (the join condition references it) however later rules re-wrap the
    * Generate, so output inspection — not shape matching — is the
    * fixpoint-safe idempotency guard. */
  private def alreadyBanded(plan: LogicalPlan): Boolean =
    plan.output.exists(_.name.startsWith(BinPrefix))

  /** Canonical key for "the same column pair, either order". */
  private def pairKey(x: Expression, y: Expression): (String, String) = {
    val (a, b) = (x.canonicalized.toString, y.canonicalized.toString)
    if (a <= b) (a, b) else (b, a)
  }

  /** Timestamp operand → its epoch-micros long (physically a reinterpret;
    * stays inside codegen). */
  private def tsMicros(e: Expression): Option[Expression] = e.dataType match {
    case TimestampType => Some(UnixMicros(e))
    case _             => None
  }

  private def numBound(a: Expression, b: Expression,
                       l: Literal): Option[(Expression, Expression, Width)] =
    if (isIntegral(a) && isIntegral(b))
      integralValue(l).filter(_ >= 0).map(w => (a, b, IntW(w)))
    else if (isFractional(a) && isFractional(b))
      fractionalValue(l).filter(w => w > 0 && !w.isNaN && !w.isInfinite)
        .map(w => (a, b, FracW(w)))
    else None

  private def tsBound(a: Expression, b: Expression,
                      micros: Long): Option[(Expression, Expression, Width)] =
    if (micros >= 0)
      for { am <- tsMicros(a); bm <- tsMicros(b) } yield (am, bm, IntW(micros))
    else None

  /** One-sided bound `a - b <= w` (after normalizing the spellings
    * `x <= y + w`, `x - w <= y`, `x >= y - w`, `x + w >= y`, their strict
    * `<`/`>` forms — a strict bound is narrower than the banded superset,
    * so binning at the same width stays sound — and the TIMESTAMP forms
    * `x <= y ± INTERVAL`, which the optimizer normalizes to
    * TimestampAddInterval with a signed DayTimeIntervalType literal;
    * operands are rewritten to epoch micros and W is the interval's
    * micros). */
  private def bound(c: Expression): Option[(Expression, Expression, Width)] =
    c match {
      case LessThanOrEqual(Subtract(a, b, _), l: Literal)    => numBound(a, b, l)
      case LessThanOrEqual(a, Add(b, l: Literal, _))         => numBound(a, b, l)
      case LessThanOrEqual(Subtract(a, l: Literal, _), b)    => numBound(a, b, l)
      case GreaterThanOrEqual(a, Subtract(b, l: Literal, _)) => numBound(b, a, l)
      case GreaterThanOrEqual(Add(a, l: Literal, _), b)      => numBound(b, a, l)
      case LessThan(Subtract(a, b, _), l: Literal)           => numBound(a, b, l)
      case LessThan(a, Add(b, l: Literal, _))                => numBound(a, b, l)
      case LessThan(Subtract(a, l: Literal, _), b)           => numBound(a, b, l)
      case GreaterThan(a, Subtract(b, l: Literal, _))        => numBound(b, a, l)
      case GreaterThan(Add(a, l: Literal, _), b)             => numBound(b, a, l)
      case LessThanOrEqual(a, TimestampAddInterval(b,
          Literal(m: Long, _: DayTimeIntervalType), _))         => tsBound(a, b, m)
      case LessThan(a, TimestampAddInterval(b,
          Literal(m: Long, _: DayTimeIntervalType), _))         => tsBound(a, b, m)
      case GreaterThanOrEqual(a, TimestampAddInterval(b,
          Literal(m: Long, _: DayTimeIntervalType), _))         => tsBound(b, a, -m)
      case GreaterThan(a, TimestampAddInterval(b,
          Literal(m: Long, _: DayTimeIntervalType), _))         => tsBound(b, a, -m)
      case _                                                 => None
    }

  /** Find a band `|a - b| <= W` in the conjuncts: either an explicit abs
    * predicate, or a pair of opposite one-sided bounds over the same column
    * pair (the BETWEEN spelling). W = the wider of the two bounds — a
    * superset band is sound because every original conjunct stays in the
    * join condition as the exact filter. */
  private def findBand(conjuncts: Seq[Expression], left: LogicalPlan,
                       right: LogicalPlan): Option[(Expression, Expression, Width)] = {
    def absHit(a: Expression, b: Expression, l: Literal) =
      numBound(a, b, l).filter(_._3.value > 0)
        .flatMap { case (x, y, w) =>
          sides(x, y, left, right).map { case (le, re) => (le, re, w) } }
    val absBand = conjuncts.iterator.map {
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), l: Literal) => absHit(a, b, l)
      case LessThan(Abs(Subtract(a, b, _), _), l: Literal)        => absHit(a, b, l)
      case _                                                      => None
    }.collectFirst { case Some(hit) => hit }
    absBand.orElse {
      // group one-sided bounds by unordered column pair; a pair bounded in
      // both directions (a-b <= w1 AND b-a <= w2) is a band of width max
      val bounds = conjuncts.flatMap(bound)
      bounds.groupBy { case (a, b, _) => pairKey(a, b) }.valuesIterator.map { g =>
        val (a0, b0, _) = g.head
        val fwd = g.collect { case (a, b, w) if a.semanticEquals(a0) && b.semanticEquals(b0) => w }
        val rev = g.collect { case (a, b, w) if a.semanticEquals(b0) && b.semanticEquals(a0) => w }
        if (fwd.nonEmpty && rev.nonEmpty) {
          // same column pair → same operand types → same width kind
          val w = (fwd ++ rev).minBy(_.value) match {
            case _: IntW  => IntW(math.max(
              fwd.collect { case IntW(x) => x }.min,
              rev.collect { case IntW(x) => x }.min))
            case _: FracW => FracW(math.max(
              fwd.collect { case FracW(x) => x }.min,
              rev.collect { case FracW(x) => x }.min))
          }
          if (w.value > 0) sides(a0, b0, left, right).map { case (le, re) => (le, re, w) }
          else None
        } else None
      }.collectFirst { case Some(hit) => hit }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !j.isStreaming && !alreadyBanded(left) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val banded = findBand(conjuncts, left, right)
      banded match {
        case Some((lExpr, rExpr, width)) =>
          def bin(e: Expression): Expression = width match {
            case IntW(w) =>
              new IntegralDivide(Cast(e, LongType), Literal(w, LongType))
            case FracW(w) =>
              Floor(Divide(Cast(e, DoubleType), Literal(w, DoubleType)))
          }
          val lbase = bin(lExpr)
          val probe = CreateArray(Seq(
            Subtract(lbase, Literal(1L, LongType)),
            lbase,
            Add(lbase, Literal(1L, LongType))))
          val lbin = AttributeReference(BinPrefix + "_l", LongType)()
          val newLeft =
            Generate(Explode(probe), Nil, outer = false, None, Seq(lbin), left)
          val rbin = Alias(bin(rExpr), BinPrefix + "_r")()
          val newRight = Project(right.output :+ rbin, right)
          val newCond = (conjuncts :+ EqualTo(lbin, rbin.toAttribute)).reduce(And)
          Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
        case None => j
      }
  }
}
