package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins. AQE's skew-join splitting
  * (spark.sql.adaptive.skewJoin, on by default) handles moderate skew at
  * runtime; this is the explicit tool for pathological single-key skew —
  * e.g. the HA recorder's one chatty sensor, or a dedup bucket whose key
  * carries half the corpus.
  */
object Skew {

  /** Salted equi-join: scatter the skewed (big) side uniformly over `salt`
    * sub-keys, replicate the other side once per sub-key, join on
    * (key, salt). The hot key's rows land on `salt` different reducers
    * instead of one, at the cost of a `salt`× blow-up of the small side —
    * the same trade a broadcast join makes, but without needing the small
    * side to fit in memory whole.
    *
    * The scatter uses rand(seed): join correctness never depends on WHICH
    * bucket a skewed-side row picks (every bucket has the full small side),
    * only that rows spread; a task retry re-scattering differently still
    * yields the same join result.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String, salt: Int,
                 joinType: String = "inner", seed: Long = 42L): DataFrame = {
    require(salt > 0, s"salt must be positive: $salt")
    val saltCol = "__graft_salt"
    val left = skewed.withColumn(saltCol, (rand(seed) * salt).cast("int"))
    val right = other.withColumn(saltCol,
      explode(sequence(lit(0), lit(salt - 1))))
    left.join(right, Seq(key, saltCol), joinType).drop(saltCol)
  }
}
