package graft.plans

import graft.etl.InfluxSink
import graft.sources.{InfluxReadTransports, InfluxScan, InfluxTable, InfluxWatermarkSource}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, AttributeSet, Cast, Coalesce, Divide, EqualTo, Expression, ExprId, Floor, GenericInternalRow, GreaterThan, GreaterThanOrEqual, IntegralDivide, IsNotNull, LessThan, LessThanOrEqual, Literal, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LeafNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** TIME-BUCKET aggregate pushdown for the Influx source — the documented
  * DSv2 boundary, closed with the next rung of the extension ladder:
  * `SupportsPushDownAggregates` is never consulted for
  * `GROUP BY time_ms div W` (V2ScanRelationPushDown only attempts a push
  * when every grouping expression is a bare attribute), so the hourly
  * rollup — THE time-series query — always pulled raw samples. This rule
  * runs after scan pushdown (injectPreCBORule), recognizes the shape
  *
  *   Aggregate(group = [f(time_ms div W)] ,
  *             aggs  = min/max(time_ms | value), count(*) ,
  *             Project?(DataSourceV2ScanRelation(influx)))
  *
  * and replaces the scan with [[InfluxBucketRollupPlan]] — a leaf that
  * POSTs the windowed Flux decomposition of `aggregateWindow` (`group() |>
  * window(every: Wms)` + per-window `sort |> limit(n:1)` / `count`) and
  * emits (bucket_start_ms, partial...) rows. The Aggregate itself stays,
  * re-keyed on the bucket attribute with its functions re-aimed at the
  * partial slots (count→sum) — Spark still merges partials across the
  * range shards, exactly like the flat aggregate pushdown's contract.
  *
  * Filters need no translation here: by preCBO time the scan pushdown has
  * already claimed them into the scan (fully, no residual) — a plan shape
  * with anything else between the Aggregate and the scan simply does not
  * match and stays untouched. Belt and braces follow the source's house
  * rule: the executor re-enforces bounds on parsed samples and falls back
  * to local bucketing whenever a server ignored `window()`, so
  * correctness never hinges on server behavior. */
object InfluxBucketRollupRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate => rewrite(agg).getOrElse(agg)
  }

  /** The translated read context of a Filter?(relation) subtree — the same
    * four knobs pushFilters claims, rebuilt from catalyst predicates
    * (preCBO runs BEFORE V2 scan pushdown, so the Filter is still a plan
    * node here). None ⟺ some conjunct is not exactly translatable. */
  private case class Bounds(startMs: Long, stopMs: Option[Long],
                            measurement: Option[String],
                            field: Option[String])

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    // unwrap: optional pure Project (aliases/attrs only) over an optional
    // fully-translatable Filter over the influx relation
    val (aliasMap, filterCond, relation) = agg.child match {
      case r: DataSourceV2Relation =>
        (Map.empty[ExprId, Expression], None, r)
      case Filter(cond, r: DataSourceV2Relation) =>
        (Map.empty[ExprId, Expression], Some(cond), r)
      case Project(projList, r: DataSourceV2Relation) =>
        val m = pureProject(projList).getOrElse(return None)
        (m, None, r)
      case Project(projList, Filter(cond, r: DataSourceV2Relation)) =>
        val m = pureProject(projList).getOrElse(return None)
        (m, Some(cond), r)
      case _ => return None
    }
    if (!relation.table.isInstanceOf[InfluxTable]) return None
    val scanOutput = relation.output

    def resolve(e: Expression): Expression = e.transformUp {
      case a: AttributeReference => aliasMap.getOrElse(a.exprId, a)
    }
    val timeAttr = scanOutput.find(_.name == "time_ms").getOrElse(return None)
    val valueAttr = scanOutput.find(_.name == "value")
    val measAttr = scanOutput.find(_.name == "measurement")
    val fieldAttr = scanOutput.find(_.name == "field")

    // translate the residual Filter exactly (same contract as pushFilters:
    // integer-exact time bounds, single measurement/field equality,
    // isnotnull over never-null reader columns) — anything else aborts
    val bounds: Bounds = {
      var start = InfluxScan.MinTimeMs
      var stop = Option.empty[Long]
      var meas = Option.empty[String]
      var fld = Option.empty[String]
      def attrOf(e: Expression): Option[AttributeReference] = e match {
        case a: AttributeReference => Some(a)
        case _ => None
      }
      def isAttr(e: Expression, target: Option[AttributeReference]): Boolean =
        attrOf(e).exists(a => target.exists(_.exprId == a.exprId))
      val conjuncts = filterCond.toSeq.flatMap(splitConjunctivePredicates)
      conjuncts.foreach {
        case GreaterThanOrEqual(t, Literal(v: Long, LongType))
          if isAttr(t, Some(timeAttr)) => start = math.max(start, v)
        case LessThanOrEqual(Literal(v: Long, LongType), t)
          if isAttr(t, Some(timeAttr)) => start = math.max(start, v)
        case GreaterThan(t, Literal(v: Long, LongType))
          if isAttr(t, Some(timeAttr)) && v != Long.MaxValue =>
          start = math.max(start, v + 1)
        case LessThan(Literal(v: Long, LongType), t)
          if isAttr(t, Some(timeAttr)) && v != Long.MaxValue =>
          start = math.max(start, v + 1)
        case LessThan(t, Literal(v: Long, LongType))
          if isAttr(t, Some(timeAttr)) =>
          stop = Some(stop.fold(v)(math.min(_, v)))
        case GreaterThan(Literal(v: Long, LongType), t)
          if isAttr(t, Some(timeAttr)) =>
          stop = Some(stop.fold(v)(math.min(_, v)))
        case LessThanOrEqual(t, Literal(v: Long, LongType))
          if isAttr(t, Some(timeAttr)) && v != Long.MaxValue =>
          stop = Some(stop.fold(v + 1)(math.min(_, v + 1)))
        case GreaterThanOrEqual(Literal(v: Long, LongType), t)
          if isAttr(t, Some(timeAttr)) && v != Long.MaxValue =>
          stop = Some(stop.fold(v + 1)(math.min(_, v + 1)))
        case EqualTo(a, Literal(s: UTF8String, StringType))
          if isAttr(a, measAttr) && meas.forall(_ == s.toString) =>
          meas = Some(s.toString)
        case EqualTo(Literal(s: UTF8String, StringType), a)
          if isAttr(a, measAttr) && meas.forall(_ == s.toString) =>
          meas = Some(s.toString)
        case EqualTo(a, Literal(s: UTF8String, StringType))
          if isAttr(a, fieldAttr) && fld.forall(_ == s.toString) =>
          fld = Some(s.toString)
        case EqualTo(Literal(s: UTF8String, StringType), a)
          if isAttr(a, fieldAttr) && fld.forall(_ == s.toString) =>
          fld = Some(s.toString)
        case IsNotNull(a)
          if isAttr(a, Some(timeAttr)) || isAttr(a, measAttr) ||
            isAttr(a, fieldAttr) => ()
        case _ => return None
      }
      Bounds(start, stop, meas, fld)
    }

    // exactly one grouping expression, shaped time_ms div W (or
    // floor(time_ms / W)) — the epoch-bucket key. Type-coercion casts
    // around the operands (floor's divide widens to double) are stripped:
    // epoch-ms magnitudes sit far below 2^53, so the double round-trip is
    // exact and floor(t/W) ≡ floorDiv(t, W) on this data
    if (agg.groupingExpressions.length != 1) return None
    def unCast(e: Expression): Expression = e match {
      case c: Cast => unCast(c.child)
      case x => x
    }
    def widthOf(e: Expression): Option[Long] = unCast(e) match {
      case Literal(w: Long, LongType) if w > 0 => Some(w)
      case Literal(w: Int, org.apache.spark.sql.types.IntegerType) if w > 0 =>
        Some(w.toLong)
      case Literal(w: Double, DoubleType)
        if w > 0 && w == w.toLong.toDouble => Some(w.toLong)
      case _ => None
    }
    def timeRef(e: Expression): Boolean = unCast(e) match {
      case a: AttributeReference => a.exprId == timeAttr.exprId
      case _ => false
    }
    val bucketMs: Long = resolve(agg.groupingExpressions.head) match {
      case IntegralDivide(l, r, _) if timeRef(l) =>
        widthOf(r).getOrElse(return None)
      case Floor(Divide(l, r, _)) if timeRef(l) =>
        widthOf(r).getOrElse(return None)
      case _ => return None
    }

    val bucketAttr = AttributeReference("bucket_start_ms", LongType,
      nullable = false)()

    // walk the aggregate functions; every one must translate to a spec
    val specs = scala.collection.mutable.ArrayBuffer.empty[InfluxScan.AggSpec]
    val slots = scala.collection.mutable.ArrayBuffer.empty[AttributeReference]
    def slotFor(spec: InfluxScan.AggSpec): AttributeReference = {
      val i = specs.indexOf(spec)
      if (i >= 0) slots(i)
      else {
        specs += spec
        val attr = spec match {
          case InfluxScan.AggCountStar =>
            AttributeReference(s"count_star_${slots.length}", LongType,
              nullable = false)()
          case InfluxScan.AggMinTime | InfluxScan.AggMaxTime =>
            AttributeReference(s"mm_time_${slots.length}", LongType)()
          case _ =>
            AttributeReference(s"mm_value_${slots.length}", DoubleType)()
        }
        slots += attr
        attr
      }
    }
    var ok = true
    def replaceAgg(ae: AggregateExpression): Expression = {
      if (ae.isDistinct || ae.filter.isDefined) { ok = false; return ae }
      // agg arguments must be the BARE column (a user-written cast would
      // change semantics and must not be silently stripped — unlike the
      // coercion casts inside the bucket expression, which are analyzed
      // no-ops on this data)
      def isTime(e: Expression): Boolean = resolve(e) match {
        case a: AttributeReference => a.exprId == timeAttr.exprId
        case _ => false
      }
      def isValue(e: Expression): Boolean = resolve(e) match {
        case a: AttributeReference => valueAttr.exists(_.exprId == a.exprId)
        case _ => false
      }
      ae.aggregateFunction match {
        case Min(c) if isTime(c) =>
          ae.copy(aggregateFunction = Min(slotFor(InfluxScan.AggMinTime)))
        case Max(c) if isTime(c) =>
          ae.copy(aggregateFunction = Max(slotFor(InfluxScan.AggMaxTime)))
        case Min(c) if isValue(c) =>
          ae.copy(aggregateFunction = Min(slotFor(InfluxScan.AggMinValue)))
        case Max(c) if isValue(c) =>
          ae.copy(aggregateFunction = Max(slotFor(InfluxScan.AggMaxValue)))
        case Count(Seq(Literal(_, _))) =>
          // count over partials merges by SUM; count can never be NULL
          Coalesce(Seq(
            ae.copy(aggregateFunction = Sum(slotFor(InfluxScan.AggCountStar))),
            Literal(0L)))
        case _ => ok = false; ae
      }
    }

    val newResult: Seq[NamedExpression] = agg.aggregateExpressions.map { ne =>
      val aggReplaced = ne.transformUp {
        case ae: AggregateExpression => replaceAgg(ae)
      }
      // outside aggregate functions only the bucket expression may remain:
      // resolve aliases and re-aim time_ms at the leaf's bucket attribute
      // (f(time_ms) is constant per bucket and bucket_start_ms lies in its
      // own bucket, so f(bucket_start_ms) IS the group key)
      aggReplaced.transformUp {
        case a: AttributeReference if aliasMap.contains(a.exprId) &&
          !slots.exists(_.exprId == a.exprId) => resolve(a)
      }.transformUp {
        case a: AttributeReference if a.exprId == timeAttr.exprId => bucketAttr
      }.asInstanceOf[NamedExpression]
    }
    if (!ok || specs.isEmpty) return None
    val newGroup = agg.groupingExpressions.map(g =>
      resolve(g).transformUp {
        case a: AttributeReference if a.exprId == timeAttr.exprId => bucketAttr
      })
    // any surviving reference to the scan's columns means a shape we did
    // not fully translate — bail out rather than risk a wrong plan
    val leaked = AttributeSet(scanOutput)
    if (newResult.exists(_.references.intersect(leaked).nonEmpty) ||
      newGroup.exists(_.references.intersect(leaked).nonEmpty)) return None

    val opts = relation.options
    val leaf = InfluxBucketRollupPlan(bucketAttr +: slots.toSeq,
      InfluxTable.cfgFrom(opts),
      Option(opts.get("readPartitions")).map(_.toInt).getOrElse(4),
      bounds.startMs, bounds.stopMs, bounds.measurement, bounds.field,
      bucketMs, specs.toSeq)
    Some(Aggregate(newGroup, newResult, leaf))
  }

  /** Alias/attr-only projections resolve to a substitution map; anything
    * computed would change row semantics before the aggregate — except
    * the pulled-out grouping expression itself, which IS the bucket key
    * (validated later by the group-shape match). */
  private def pureProject(projList: Seq[NamedExpression])
      : Option[Map[ExprId, Expression]] = {
    val entries = projList.map {
      case a @ Alias(e, _) => a.exprId -> e
      case a: AttributeReference => a.exprId -> (a: Expression)
    }
    Some(entries.toMap)
  }
}

/** Leaf logical node: windowed server-side partials of an Influx range —
  * (bucket_start_ms, one slot per pushed aggregate), one row per (range
  * shard × non-empty bucket). */
case class InfluxBucketRollupPlan(output: Seq[Attribute],
                                  cfg: InfluxSink.Config,
                                  readPartitions: Int, startMs: Long,
                                  stopMs: Option[Long],
                                  measurement: Option[String],
                                  field: Option[String], bucketMs: Long,
                                  specs: Seq[InfluxScan.AggSpec])
    extends LeafNode

object InfluxRollupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: InfluxBucketRollupPlan =>
      InfluxBucketRollupExec(p.output, p.cfg, p.readPartitions, p.startMs,
        p.stopMs, p.measurement, p.field, p.bucketMs, p.specs) :: Nil
    case _ => Nil
  }
}

/** One task per range shard (the scan's own sharding rule); each POSTs the
  * windowed Flux per spec and emits per-bucket partial rows. House belt
  * and braces: min/max NEVER trust the server's window key — samples are
  * re-enforced against the pushed bounds and bucketed locally by their own
  * timestamps (a server that ignored window()/limit entirely still yields
  * the exact partials); a count response that looks like raw samples is
  * bucketed and counted locally the same way. */
case class InfluxBucketRollupExec(output: Seq[Attribute],
                                  cfg: InfluxSink.Config,
                                  readPartitions: Int, startMs: Long,
                                  stopMs: Option[Long],
                                  measurement: Option[String],
                                  field: Option[String], bucketMs: Long,
                                  specs: Seq[InfluxScan.AggSpec])
    extends LeafExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val shards: Seq[(Long, Option[Long])] = stopMs match {
      // contradictory range: zero buckets IS the grouped empty answer
      case Some(stop) if stop <= startMs => Nil
      case Some(stop) if readPartitions > 1 && stop - startMs >= readPartitions =>
        val width = (stop - startMs) / readPartitions
        (0 until readPartitions).map { i =>
          val s = startMs + i * width
          (s, Some(if (i == readPartitions - 1) stop else s + width))
        }
      case _ => Seq((startMs, stopMs))
    }
    if (shards.isEmpty)
      return sparkContext.emptyRDD[InternalRow]
    val (lcfg, lspecs, lbucket, lm, lf) = (cfg, specs, bucketMs, measurement, field)
    sparkContext.parallelize(shards, shards.length).flatMap { case (s, e) =>
      InfluxRollup.partials(lcfg, lspecs, lbucket, s, e, lm, lf)
    }
  }

  override def simpleStringWithNodeId(): String =
    s"InfluxBucketRollup every=${bucketMs}ms specs=${specs.mkString(",")}"
}

private[graft] object InfluxRollup {

  private def post(cfg: InfluxSink.Config)(fluxSrc: String): String =
    InfluxReadTransports.testOverride match {
      case Some(f) => f(fluxSrc)
      case None => InfluxWatermarkSource.postFlux(cfg, fluxSrc)
    }

  def partials(cfg: InfluxSink.Config, specs: Seq[InfluxScan.AggSpec],
               bucketMs: Long, startMs: Long, stopMs: Option[Long],
               measurement: Option[String], field: Option[String])
      : Iterator[InternalRow] = {
    def reEnforced(csv: String): Seq[InfluxScan.Sample] =
      InfluxScan.parseSamples(csv).filter(s =>
        s.timeMs >= startMs && stopMs.forall(s.timeMs < _) &&
          measurement.forall(_ == s.measurement) && field.forall(_ == s.field))
    def bucketOf(t: Long): Long = Math.floorDiv(t, bucketMs) * bucketMs

    val acc = scala.collection.mutable.LinkedHashMap.empty[Long, Array[Any]]
    def slotsAt(b: Long): Array[Any] =
      acc.getOrElseUpdate(b, new Array[Any](specs.length))

    def minMaxWindowed(sortCol: String, desc: Boolean): Seq[InfluxScan.Sample] =
      reEnforced(post(cfg)(InfluxScan.flux(cfg.bucket, startMs, stopMs,
        measurement, field, limit = Some(1), sortDesc = Some(desc),
        sortCol = sortCol,
        aggPrep = Some(if (sortCol == "_value") "value" else "time"),
        windowEveryMs = Some(bucketMs))))

    specs.zipWithIndex.foreach { case (spec, i) =>
      def fold[T](samples: Seq[InfluxScan.Sample], of: InfluxScan.Sample => Option[T],
                  better: (T, T) => T, box: T => Any): Unit =
        samples.foreach { smp =>
          of(smp).foreach { v =>
            val sl = slotsAt(bucketOf(smp.timeMs))
            sl(i) =
              if (sl(i) == null) box(v)
              else box(better(sl(i).asInstanceOf[T], v))
          }
        }
      spec match {
        case InfluxScan.AggMinTime =>
          fold[Long](minMaxWindowed("_time", desc = false), s => Some(s.timeMs),
            math.min, Long.box)
        case InfluxScan.AggMaxTime =>
          fold[Long](minMaxWindowed("_time", desc = true), s => Some(s.timeMs),
            math.max, Long.box)
        case InfluxScan.AggMinValue =>
          fold[Double](minMaxWindowed("_value", desc = false), _.value,
            math.min, Double.box)
        case InfluxScan.AggMaxValue =>
          fold[Double](minMaxWindowed("_value", desc = true), _.value,
            math.max, Double.box)
        case InfluxScan.AggCountStar =>
          val csv = post(cfg)(InfluxScan.flux(cfg.bucket, startMs, stopMs,
            measurement, field, count = true,
            windowEveryMs = Some(bucketMs)))
          InfluxScan.parseWindowedCounts(csv) match {
            case Some(m) =>
              // trust the server's window starts (epoch-aligned for ms
              // periods, same floorDiv contract), clamped to the shard
              m.foreach { case (b0, n) =>
                if (b0 >= bucketOf(startMs) && stopMs.forall(b0 < _)) {
                  val sl = slotsAt(b0)
                  sl(i) = (if (sl(i) == null) 0L
                           else sl(i).asInstanceOf[Long]) + n
                }
              }
            case None => // raw samples: bucket + count locally
              reEnforced(csv).foreach { smp =>
                val sl = slotsAt(bucketOf(smp.timeMs))
                sl(i) = (if (sl(i) == null) 0L
                         else sl(i).asInstanceOf[Long]) + 1L
              }
          }
      }
    }
    // a bucket discovered only by a min/max query still needs its count
    // slot non-null (the final merge sums them)
    val countIdx = specs.zipWithIndex.collect {
      case (InfluxScan.AggCountStar, i) => i
    }
    acc.iterator.map { case (b, sl) =>
      countIdx.foreach(i => if (sl(i) == null) sl(i) = 0L)
      new GenericInternalRow((Long.box(b) +: sl.toSeq).toArray)
    }
  }
}
