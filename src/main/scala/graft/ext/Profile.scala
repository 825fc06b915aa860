package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling — the stats pass an engine runs before
  * planning or a pipeline runs before trusting a new drop: per column,
  * null count, exact distinct count, and min/max. ONE aggregation job for
  * the whole profile (Spark plans the n distinct aggregates as a single
  * Expand — one scan, rows × |cols| intermediate, partial-agg'd), then the
  * single result row pivots to one row per column with a map-side explode.
  * Min/max compare as strings so the profile is schema-agnostic; callers
  * pass numeric-formatting-sensitive columns (double, timestamp) through
  * an explicit cast first. The exact distinct count is the oracle-checked
  * baseline; `approx_count_distinct` is the documented 100 TB scale twin
  * (see `events_distinct_users_hll`).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c).cast("string")).as(s"${c}__mn"),
        max(col(c).cast("string")).as(s"${c}__mx"))
    }
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"),
        (col("__total") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mn").as("min_value"),
        col(s"${c}__mx").as("max_value"))
    }
    row.select(explode(array(stacked: _*)).as("s")).select(col("s.*"))
  }
}
