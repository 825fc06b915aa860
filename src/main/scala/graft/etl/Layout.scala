package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Partition layout for scan elimination. Complements [[Bucketing]] (which
  * eliminates the JOIN shuffle): directory partitioning eliminates the SCAN
  * — a predicate on the partition column prunes whole directories at
  * planning time, and a JOIN against a filtered dimension prunes them at
  * RUNTIME via dynamic partition pruning (the dim-side filter result is
  * broadcast and re-used as a partition filter on the fact scan, so a
  * "revenue for last week's promo days" query over a 100 TB, 3-year fact
  * table reads ~7/1000 of its files instead of all of them).
  *
  * Partition column choice at scale: low cardinality (date, region — NOT
  * user_id; a 10⁸-cardinality partition column means 10⁸ directories and
  * a dead NameNode/listing path), aligned with the dominant predicate.
  */
object Layout {

  /** Persist `df` partitioned by `col` (one directory per distinct value).
    * Repartitions by the partition column first so each directory is
    * written by the tasks owning that key — without it every task appends
    * a file to every directory (tasks × partitions small files, the
    * classic 100 TB small-file explosion). */
  def writePartitioned(df: DataFrame, path: String, column: String): Unit =
    df.repartition(col(column))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(column)
      .parquet(path)
}
