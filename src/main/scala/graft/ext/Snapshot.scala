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
