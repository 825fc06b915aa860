package graft.plans

import graft.sources.InfluxTable
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, EqualTo, Expression, ExprId, GetMapValue, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, Literal, PredicateHelper, RowNumber, SortOrder, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, WindowGroupLimit, Window => LWindow}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.unsafe.types.UTF8String

/** GROUPED TopN narrowing for the Influx source — "top k readings per
  * sensor", the shape no DSv2 contract carries (`SupportsPushDownTopN` is
  * global-only, and a `row_number() OVER (PARTITION BY tags['k'] ORDER BY
  * value) <= k` filter blocks every other push). By preCBO time Spark's
  * own InferWindowGroupLimit has already reduced the Filter-over-Window
  * pattern to a [[WindowGroupLimit]] node carrying exactly the
  * (partition, order, rank function, k) tuple; this rule claims the
  * row_number instances whose partition keys are tag/measurement/field
  * extractions, whose order is the single value column, and whose
  * underlying Filter is fully expressible server-side — and narrows the
  * SCAN via a relation option (the reader then POSTs, per range shard,
  * per GROUP: `group(columns:) |> top/bottom(n: k)` over the numeric
  * population plus a per-group limit-k pull of the non-numeric NULL-value
  * pad rows — a superset of any valid row_number ≤ k selection under
  * either null ordering, since per-group top-k is monotone under union).
  *
  * The trust posture is the tag-narrowing one, NOT the rollup one: the
  * WindowGroupLimit, Window and Filter all STAY in the plan, so Spark
  * recomputes every rank over whatever rows come back — an honest server
  * cuts the transfer from every sample to ≈ k·groups rows per shard, a
  * lying server changes bytes moved, never results. ONLY row_number is
  * claimed: rank()/dense_rank() admit ties past position k, which a
  * server-side top(n: k) truncation would drop — wrong on an HONEST
  * server — while row_number's tie choice is arbitrary by definition, so
  * any superset recomputation is a valid answer.
  *
  * The gate on the underlying Filter mirrors the rollup translation
  * (integer-exact time bounds, measurement/field equality, `tags['k']`
  * equality, isnotnull over never-null reader columns): an untranslatable
  * conjunct — say `value > 5` — would make even an honest server compute
  * its per-group top-k over the WRONG population, so the rewrite declines
  * and the plan stays on the ordinary scan. The accepted conjuncts reach
  * the Flux programs through the ordinary push paths (pushFilters for the
  * bounds, [[InfluxTagFilterRule]] for the tag equalities). Rule order is
  * immaterial — [[InfluxTagFilterRule]] is in fact injected first — since
  * both narrowings only add independent relation options and each keeps
  * its residual in the plan. */
object InfluxGroupTopNRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // InferWindowGroupLimit runs AFTER preCBO, so the live pattern here
    // is the raw Filter-over-Window; the WindowGroupLimit form is kept
    // for robustness against batch reordering across Spark versions
    case wgl @ WindowGroupLimit(ps, os, _: RowNumber, limit, child) =>
      rewrite(ps, os, limit, child).map(c => wgl.copy(child = c))
        .getOrElse(wgl)
    case f @ Filter(cond,
        w @ LWindow(Seq(a @ Alias(WindowExpression(_: RowNumber, _), _)),
          ps, os, child, _)) =>
      kFrom(cond, a.toAttribute)
        .flatMap(k => rewrite(ps, os, k, child))
        .map(c => f.copy(child = w.copy(child = c)))
        .getOrElse(f)
  }

  /** An upper bound on the rank attribute among the Filter's conjuncts —
    * the k of the push. Conjuncts NOT on the rank attribute are fine:
    * they apply above the recomputed Window, client-side, to whichever
    * superset comes back. */
  private def kFrom(cond: Expression, rank: Attribute): Option[Int] = {
    def r(e: Expression): Boolean = e match {
      case x: AttributeReference => x.exprId == rank.exprId
      case _ => false
    }
    val ks = splitConjunctivePredicates(cond).collect {
      case LessThanOrEqual(e, Literal(k: Int, IntegerType)) if r(e) => k
      case LessThan(e, Literal(k: Int, IntegerType)) if r(e) => k - 1
      case EqualTo(e, Literal(k: Int, IntegerType)) if r(e) => k
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), e) if r(e) => k
      case GreaterThan(Literal(k: Int, IntegerType), e) if r(e) => k - 1
      case EqualTo(Literal(k: Int, IntegerType), e) if r(e) => k
    }
    ks.minOption.filter(_ >= 1)
  }

  private def rewrite(ps: Seq[Expression], os: Seq[SortOrder], limit: Int,
                      child: LogicalPlan): Option[LogicalPlan] = {
    if (limit < 1) return None
    val (aliasMap, filterCond, relation) = child match {
      case r: DataSourceV2Relation =>
        (Map.empty[ExprId, Expression], None, r)
      case Filter(cond, r: DataSourceV2Relation) =>
        (Map.empty[ExprId, Expression], Some(cond), r)
      case Project(projList, r: DataSourceV2Relation) =>
        (pureProject(projList).getOrElse(return None), None, r)
      case Project(projList, Filter(cond, r: DataSourceV2Relation)) =>
        (pureProject(projList).getOrElse(return None), Some(cond), r)
      case _ => return None
    }
    if (!relation.table.isInstanceOf[InfluxTable]) return None
    if (relation.options.containsKey(InfluxTable.GroupTopNOption)) return None
    val out = relation.output
    val timeAttr = out.find(_.name == "time_ms").getOrElse(return None)
    val valueAttr = out.find(_.name == "value").getOrElse(return None)
    val measAttr = out.find(_.name == "measurement")
    val fieldAttr = out.find(_.name == "field")
    val tagsAttr = out.find(_.name == "tags")

    def resolve(e: Expression): Expression = e.transformUp {
      case a: AttributeReference => aliasMap.getOrElse(a.exprId, a)
    }
    // the BARE tags attribute only — the tag equalities this gate accepts
    // reach the Flux programs via InfluxTagFilterRule, whose own matcher
    // requires a bare AttributeReference; unwrapping a Cast here would
    // pass a conjunct the narrowing never pushes, and the server's
    // per-group top-k would then run over the unfiltered population
    // (rows missing on an HONEST server once the residual filter drops
    // the foreign-tag rows that displaced them)
    def isTagsMap(e: Expression): Boolean = e match {
      case a: AttributeReference => tagsAttr.exists(_.exprId == a.exprId)
      case _ => false
    }
    def is(e: Expression, t: Option[AttributeReference]): Boolean = e match {
      case a: AttributeReference => t.exists(_.exprId == a.exprId)
      case _ => false
    }
    def tagKeyOf(e: Expression): Option[String] = e match {
      case GetMapValue(m, Literal(k: UTF8String, StringType))
        if isTagsMap(m) => Some(k.toString)
      case _ => None
    }

    // the Filter gate: every conjunct must be one the ordinary push paths
    // carry into the Flux programs — otherwise the server's per-group
    // top-k runs over the wrong population. IsNotNull over a tags['k']
    // extraction is accepted only ALONGSIDE an equality on the same key
    // (the equality implies it), mirroring the rollup gate.
    val TagSet = new InfluxTagSets.Extractor(tagKeyOf)
    val TagRe = new InfluxTagSets.RegexExtractor(tagKeyOf)
    val tagSets = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
    val tagRegexes = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val notNullTagKeys = scala.collection.mutable.Set.empty[String]
    val conjOk = filterCond.toSeq.flatMap(splitConjunctivePredicates)
      .forall {
        case GreaterThanOrEqual(t, Literal(_: Long, LongType))
          if is(t, Some(timeAttr)) => true
        case GreaterThan(t, Literal(v: Long, LongType))
          if is(t, Some(timeAttr)) && v != Long.MaxValue => true
        case LessThan(t, Literal(_: Long, LongType))
          if is(t, Some(timeAttr)) => true
        case LessThanOrEqual(t, Literal(v: Long, LongType))
          if is(t, Some(timeAttr)) && v != Long.MaxValue => true
        case GreaterThanOrEqual(Literal(_: Long, LongType), t)
          if is(t, Some(timeAttr)) => true
        case LessThan(Literal(v: Long, LongType), t)
          if is(t, Some(timeAttr)) && v != Long.MaxValue => true
        case EqualTo(a, Literal(_: UTF8String, StringType))
          if is(a, measAttr) || is(a, fieldAttr) => true
        case EqualTo(Literal(_: UTF8String, StringType), a)
          if is(a, measAttr) || is(a, fieldAttr) => true
        // tag equality / IN / OR-of-equality sets — the exact predicate
        // family InfluxTagFilterRule pushes (shared recognizer, so the
        // two gates can never drift on what "pushable" means)
        case TagSet(k, vs) => tagSets += ((k, vs)); true
        // LIKE-family regex conjuncts — pushed by InfluxTagFilterRule as
        // Flux `=~` stages through the same recognizer, so the server's
        // per-group top-k runs over the regex-true population
        case TagRe(k, re) => tagRegexes += ((k, re)); true
        case IsNotNull(a)
          if is(a, Some(timeAttr)) || is(a, measAttr) || is(a, fieldAttr) ||
            isTagsMap(a) => true
        case IsNotNull(e) if tagKeyOf(e).isDefined =>
          notNullTagKeys += tagKeyOf(e).get; true
        case _ => false
      }
    // same-key conjuncts INTERSECT — the pushed TagFilter option carries
    // exactly that intersection (InfluxTagFilterRule folds through the
    // same intersectByKey), so the server's per-group top-k runs over the
    // conjunction-true population, never a union. An empty intersection
    // means the filter rule pushes NOTHING while this gate would have
    // accepted the conjuncts — decline; the unpushed plan answers the
    // always-false predicate (with the empty result) by itself.
    val computed = InfluxTagSets.intersectByKey(tagSets.toSeq) match {
      case Some(merged) => merged
      case None => return None
    }
    // A PRE-EXISTING pushedTagFilters/pushedTagRegexes option (e.g.
    // passed directly in read options) narrows the server population
    // independently of this Filter, and InfluxTagFilterRule skips pushing
    // when EITHER option is already present — so the soundness argument
    // "the server's per-group top-k runs over exactly the
    // conjunction-true population" only holds when the carried predicates
    // (absent option = none) EQUAL the computed ones, for BOTH kinds. Any
    // difference (wider, narrower, disjoint, or an option with no
    // matching conjuncts at all) would let foreign rows displace — or
    // pre-drop — true top-k rows on an HONEST server: decline.
    val optEq = Option(relation.options.get(InfluxTable.TagFilterOption))
      .filter(_.nonEmpty)
    val optRe = Option(relation.options.get(InfluxTable.TagRegexOption))
      .filter(_.nonEmpty)
    if (optEq.isDefined || optRe.isDefined) {
      val carriedEq = optEq.map(InfluxTable.decodeTagEq).getOrElse(Nil)
        .map { case (k, vs) => k -> vs.toSet }.toMap
      if (carriedEq != computed.map { case (k, vs) => k -> vs.toSet }.toMap)
        return None
      val carriedRe = optRe.map(InfluxTable.decodeTagRegex).getOrElse(Nil)
      if (carriedRe.toSet != tagRegexes.toSet) return None
    }
    val pushedTagKeys = computed.map(_._1).toSet ++ tagRegexes.map(_._1)
    if (!conjOk || !notNullTagKeys.subsetOf(pushedTagKeys)) return None

    // partition keys → group-column tokens
    val cols = ps.map(e => resolve(e) match {
      case a: AttributeReference if measAttr.exists(_.exprId == a.exprId) =>
        "measurement"
      case a: AttributeReference if fieldAttr.exists(_.exprId == a.exprId) =>
        "field"
      case gm if tagKeyOf(gm).isDefined => s"tag:${tagKeyOf(gm).get}"
      case _ => return None
    })
    if (cols.isEmpty || cols.distinct.size != cols.size) return None

    // order: the single bare value column, either direction (both null
    // orderings covered by the numeric-top + NULL-pad program pair)
    val desc = os match {
      case Seq(SortOrder(v, dir, _, _)) if is(resolve(v), Some(valueAttr)) =>
        dir match {
          case Descending => true
          case Ascending => false
          case _ => return None
        }
      case _ => return None
    }

    val m = new java.util.HashMap[String, String](
      relation.options.asCaseSensitiveMap())
    m.put(InfluxTable.GroupTopNOption,
      InfluxTable.encodeGroupTopN(limit, desc, cols))
    val narrowed = relation.copy(options =
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(m))
    Some(child.transformUp {
      case r: DataSourceV2Relation if r.fastEquals(relation) => narrowed
    })
  }

  private def pureProject(projList: Seq[Expression])
      : Option[Map[ExprId, Expression]] =
    Some(projList.map {
      case a @ Alias(e, _) => a.exprId -> e
      case a: AttributeReference => a.exprId -> (a: Expression)
      case _ => return None
    }.toMap)
}
