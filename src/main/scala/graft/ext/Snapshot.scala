package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-ingest primitives over two snapshots of the same table —
  * the change-data-capture shapes a periodic 100 TB ingest runs: classify
  * what changed ([[diff]]) and roll the changes into a slowly-changing-
  * dimension history ([[scd2]], Kimball type 2).
  *
  * Scale posture: the value columns are collapsed to ONE 64-bit comparator
  * per row BEFORE the join, so the full-outer exchange carries (key, hash)
  * — never the wide row — and both sides co-partition on the key. diff is
  * one shuffle join; scd2 adds only a map-side explode (≤2 rows per key).
  */
object Snapshot {

  /** Null-position-safe row comparator: each value column is preceded by
    * its null flag, so Spark's hash (which SKIPS null inputs) cannot
    * confuse (null, x) with (x, null) across adjacent columns. */
  private def rowHash(cols: Seq[String]): Column =
    xxhash64(cols.flatMap(c =>
      Seq(col(c).isNull.cast("int"), col(c))): _*)

  /** Classify every key across two snapshots: `insert` (new only),
    * `delete` (old only), `update` (both, values differ), `unchanged`. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
           cols: Seq[String]): DataFrame = {
    val oh = oldSnap.select(col(key), rowHash(cols).as("h_old"))
    val nh = newSnap.select(col(key), rowHash(cols).as("h_new"))
    oh.join(nh, Seq(key), "full_outer")
      .select(col(key),
        when(col("h_old").isNull, lit("insert"))
          .when(col("h_new").isNull, lit("delete"))
          .when(col("h_old") =!= col("h_new"), lit("update"))
          .otherwise(lit("unchanged")).as("change_type"))
  }

  /** Apply a CDC changelog to a base snapshot — the MERGE/upsert-compaction
    * shape every incremental 100 TB ingest runs (the Hudi/Delta merge,
    * inverse of [[diff]]): each key's LATEST changelog entry by `seq` wins —
    * `D` removes the key, `I`/`U` upsert the value columns — and keys the
    * log never touches keep their base row. Contract: (key, seq) unique,
    * the property every CDC source with a sequence/commit number provides;
    * on that contract the result is deterministic (and the spec proves the
    * algebra: applying the changelog derived from diff(old, new) to `old`
    * reproduces `new` exactly).
    *
    * Scale posture: the changelog compacts FIRST — one partial-aggregated
    * max(struct) groupBy collapses per-key histories map-side, so the join
    * sees one row per touched key, not the full log; the apply itself is
    * one key-keyed full-outer shuffle join carrying (key, values) on both
    * sides. No window: latest-wins is an aggregate, not a per-key sort. */
  def applyChangelog(base: DataFrame, log: DataFrame, key: String,
                     cols: Seq[String]): DataFrame = {
    val vcols = cols.map(col)
    val latest = log.groupBy(col(key))
      .agg(max(struct(col("seq") +: col("op") +: vcols: _*)).as("last"))
      .select(col(key), col("last.op").as("op"),
        struct(cols.map(c => col(s"last.$c").as(c)): _*).as("v_log"))
    base.select(col(key), struct(vcols: _*).as("v_base"))
      .join(latest, Seq(key), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col(key) +: cols.map(c =>
        when(col("op").isNotNull, col(s"v_log.$c"))
          .otherwise(col(s"v_base.$c")).as(c)): _*)
  }

  /** Incremental maintenance of a grouped aggregate under a changelog —
    * the materialized-view shape of a 100 TB rollup: the stored per-group
    * (count, sum, min) is updated from the delta WITHOUT rescanning the
    * base, except where algebra forces it. count and the DECIMAL-exact sum
    * are self-maintainable (old ⊕ signed delta — decimal addition is
    * associative, so the maintained sum is BIT-EXACT against a fresh
    * recompute, which is what the oracle runs). min is NOT maintainable
    * under deletes: a group is recomputed ONLY if a deleted value reached
    * the stored min (`min_del <= min_old` — deleting anything larger
    * cannot move it, and equality must rescan because the min may occur
    * twice); insert-only groups take least(min_old, min_ins). The rescan
    * reads base ∖ deletes ∪ inserts restricted to the dirty groups by a
    * broadcast-friendly semi-join — at scale, partition pruning on the
    * group key turns that into reading only the touched partitions.
    *
    * `base`/`inserts`/`deletes` share the events schema; deletes identify
    * base rows by event_id. Groups whose maintained count reaches 0 drop,
    * exactly as a fresh GROUP BY would. */
  def maintainHourlyAgg(base: DataFrame, inserts: DataFrame,
                        deletes: DataFrame): DataFrame = {
    val survivors = prepHourly(base)
      .join(deletes.select(col("event_id")), Seq("event_id"), "left_anti")
      .unionByName(prepHourly(inserts), allowMissingColumns = false)
    renderHourlyAgg(
      maintainAggState(hourlyAggState(base), survivors, inserts, deletes))
  }

  private val HourlyKeys = Seq("event_type", "hour_start")

  /** Events projected to the rollup's working shape: group key columns +
    * the raw value + its exact-DECIMAL image for the maintainable sum. */
  private[graft] def prepHourly(df: DataFrame): DataFrame =
    df.select(col("event_id"), col("event_type"),
      date_trunc("hour", col("ts")).as("hour_start"),
      col("value"), col("value").cast(SumType).as("dv"))

  private val SumType = org.apache.spark.sql.types.DecimalType(25, 10)
  // sum(DECIMAL(25,10)) widens to (35,10); state pins that type so the
  // merged sums stay identically typed across maintenance iterations
  private val StateSumType = org.apache.spark.sql.types.DecimalType(35, 10)

  /** The STORED state of the rollup — (keys, n0, s0 DECIMAL, m0). The sum
    * is kept in exact DECIMAL so iterated maintenance never accumulates
    * float drift; [[renderHourlyAgg]] casts to double only on emit. */
  private[graft] def hourlyAggState(df: DataFrame): DataFrame =
    gaggHourly(df, "0")

  private def gaggHourly(df: DataFrame, suffix: String): DataFrame =
    prepHourly(df).groupBy(HourlyKeys.map(col): _*)
      .agg(count(lit(1)).as(s"n$suffix"),
        sum(col("dv")).cast(StateSumType).as(s"s$suffix"),
        min(col("value")).as(s"m$suffix"))

  /** ONE maintenance step: previous state ⊕ (inserts, deletes) → next
    * state. `survivors` must be the prepHourly view of the post-change
    * table (base ∖ deletes ∪ inserts) — it is touched ONLY for groups
    * whose deleted min reached the stored min, via the semi-join-pruned
    * min rescan. Composable: the streaming twin folds this per
    * micro-batch and must land on the one-shot result exactly. */
  private[graft] def maintainAggState(oldAgg: DataFrame, survivors: DataFrame,
                                      inserts: DataFrame,
                                      deletes: DataFrame): DataFrame = {
    val merged = oldAgg
      .join(gaggHourly(inserts, "_i"), HourlyKeys, "full_outer")
      .join(gaggHourly(deletes, "_d"), HourlyKeys, "full_outer")
    val zero = lit(java.math.BigDecimal.ZERO).cast(StateSumType)
    val nNew = coalesce(col("n0"), lit(0L)) + coalesce(col("n_i"), lit(0L)) -
      coalesce(col("n_d"), lit(0L))
    val sNew = coalesce(col("s0"), zero) + coalesce(col("s_i"), zero) -
      coalesce(col("s_d"), zero)
    // dirty ⟺ the deletes could have consumed the stored min (NULL base
    // min with any delete is conservatively dirty; deleting only NULL
    // values — m_d NULL — never moves a non-NULL min)
    val dirty = col("m_d") <= col("m0") ||
      (col("n_d") > 0 && col("m0").isNull)
    val counts = merged.select(
      HourlyKeys.map(col) :+ nNew.as("n_new") :+
        sNew.cast(StateSumType).as("s_new") :+
        col("m0") :+ col("m_i") :+ coalesce(dirty, lit(false)).as("dirty"): _*)
      .filter(col("n_new") > 0)

    // min rescan, restricted to the dirty groups only
    val dirtyKeys = counts.filter(col("dirty")).select(HourlyKeys.map(col): _*)
    val rescanned = survivors
      .join(dirtyKeys, HourlyKeys, "left_semi")
      .groupBy(HourlyKeys.map(col): _*)
      .agg(min(col("value")).as("m_rescan"))

    counts.join(rescanned, HourlyKeys, "left_outer")
      .select(HourlyKeys.map(col) :+ col("n_new").as("n0") :+
        col("s_new").as("s0") :+
        when(col("dirty"), col("m_rescan"))
          .when(col("m_i").isNull, col("m0"))
          .when(col("m0").isNull, col("m_i"))
          .otherwise(least(col("m0"), col("m_i"))).as("m0"): _*)
  }

  /** State → the public rollup schema (epoch-ms hour, double sum). */
  private[graft] def renderHourlyAgg(state: DataFrame): DataFrame =
    state.select(col("event_type"),
      unix_millis(col("hour_start")).as("hour_ms"),
      col("n0").as("n_events"),
      col("s0").cast("double").as("sum_value"),
      col("m0").as("min_value"))

  /** SCD type-2 merge of `newSnap` (observed at `newTs`) over `oldSnap`
    * (observed at `oldTs`): updated/deleted keys emit their old version
    * CLOSED (valid_to = newTs), live keys emit their current version open
    * (valid_to NULL); an updated key therefore yields two rows. Output =
    * key, value columns, valid_from, valid_to, is_current. */
  def scd2(oldSnap: DataFrame, newSnap: DataFrame, key: String,
           cols: Seq[String], oldTs: Long, newTs: Long): DataFrame = {
    val vcols = cols.map(col)
    val o = oldSnap.select(col(key), struct(vcols: _*).as("v_old"),
      rowHash(cols).as("h_old"))
    val n = newSnap.select(col(key), struct(vcols: _*).as("v_new"),
      rowHash(cols).as("h_new"))
    val isIns = col("h_old").isNull
    val isDel = col("h_new").isNull
    val isUpd = !isIns && !isDel && col("h_old") =!= col("h_new")
    val nullTo = lit(null).cast("bigint")
    val closed = when(isDel || isUpd,
      struct(col("v_old").as("v"), lit(oldTs).as("valid_from"),
        lit(newTs).as("valid_to"), lit(false).as("is_current")))
    val current = when(!isDel,
      struct(when(isIns || isUpd, col("v_new")).otherwise(col("v_old")).as("v"),
        when(isIns || isUpd, lit(newTs)).otherwise(lit(oldTs)).as("valid_from"),
        nullTo.as("valid_to"), lit(true).as("is_current")))
    o.join(n, Seq(key), "full_outer")
      .select(col(key),
        explode(filter(array(closed, current), _.isNotNull)).as("r"))
      .select(col(key) +: cols.map(c => col(s"r.v.$c").as(c)) :+
        col("r.valid_from") :+ col("r.valid_to") :+ col("r.is_current"): _*)
  }
}
