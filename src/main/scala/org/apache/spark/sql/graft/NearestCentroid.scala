package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** argmin over a FIXED centroid set of cosine distance (or, with
  * `euclidean = true`, Euclidean distance — the PQ-codebook metric, ranked
  * by the monotone-equivalent |c|² − 2⟨v,c⟩ so the constant |v|² is never
  * computed) to the input FLOAT vector — k-means / IVF bucket / PQ
  * codeword assignment as a pure PROJECTION.
  *
  * The centroid matrix (k × dim, driver-sized by construction: k centroids
  * of a clustering) is embedded in the expression and ships to executors
  * inside the serialized plan — the moral equivalent of a broadcast, with
  * zero join. This replaces a crossJoin(broadcast(centroids)) +
  * groupBy(vec_id).agg(min_by…) formulation whose FINAL aggregation
  * re-shuffled every (vec_id, embedding) row of the corpus once per Lloyd
  * round; here assignment never exchanges anything, so the only shuffle
  * left in a Lloyd round is the tiny (centroid_id, dim) partial-agg of the
  * mean recomputation.
  *
  * Value-compatible with the join formulation it replaces:
  * cdist = -(fvec_dot(v, c) / (|v|·|c|)) with the exact [[FloatVecDot]]
  * float-widened left-to-right fold, ties (equal cdist) break to the lower
  * centroid_id, and NaN distances (zero vector or zero centroid) lose to
  * any non-NaN distance — the same ordering `min(struct(cdist, id))` gives
  * (Spark sorts NaN above every double). An all-NaN row (zero input vector)
  * lands in the lowest centroid_id.
  */
case class NearestCentroid(child: Expression, centroidIds: Seq[Long],
                           centroids: Seq[Seq[Float]],
                           euclidean: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {

  require(centroidIds.nonEmpty && centroidIds.length == centroids.length,
    "NearestCentroid needs one id per centroid vector (non-empty)")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  @transient private lazy val model =
    NearestCentroid.Model(centroidIds.toArray, centroids.map(_.toArray).toArray,
      euclidean)

  override protected def nullSafeEval(input: Any): Any =
    model.assign(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("ncModel", model,
      classOf[NearestCentroid.Model].getName)
    defineCodeGen(ctx, ev, c => s"$modelRef.assign($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** The `nprobe` nearest centroids of the input vector, ascending by
  * (distance, centroid_id) — multi-probe bucket assignment for kNN-graph
  * construction as a pure PROJECTION, generalizing [[NearestCentroid]]
  * (whose result is exactly element 0 of this one, so a corpus bucketed by
  * the top-1 expression and probed by this one can never disagree on the
  * home bucket). Same matrix-in-the-plan posture, same tie/NaN contract:
  * equal distances rank by lower centroid_id, NaN distances lose to every
  * non-NaN one. Returns fewer than `nprobe` ids only when the centroid set
  * itself is smaller. */
case class NearestCentroids(child: Expression, centroidIds: Seq[Long],
                            centroids: Seq[Seq[Float]], nprobe: Int,
                            euclidean: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {

  require(centroidIds.nonEmpty && centroidIds.length == centroids.length,
    "NearestCentroids needs one id per centroid vector (non-empty)")
  require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  @transient private lazy val model =
    NearestCentroid.Model(centroidIds.toArray, centroids.map(_.toArray).toArray,
      euclidean)

  override protected def nullSafeEval(input: Any): Any =
    model.assignTop(input.asInstanceOf[ArrayData], nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("ncModel", model,
      classOf[NearestCentroid.Model].getName)
    defineCodeGen(ctx, ev, c => s"$modelRef.assignTop($c, $nprobe)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

object NearestCentroid {
  /** Prepared centroid matrix: sorted by id (so a strict `<` scan breaks
    * distance ties to the lowest id) with per-centroid norms precomputed
    * once instead of once per input row. */
  case class Model(ids0: Array[Long], vecs0: Array[Array[Float]],
                   euclidean: Boolean = false)
      extends Serializable {
    private val order = ids0.indices.sortBy(i => ids0(i)).toArray
    val ids: Array[Long] = order.map(i => ids0(i))
    val vecs: Array[Array[Float]] = order.map(i => vecs0(i))
    val norms: Array[Double] = vecs.map { c =>
      var s = 0.0
      var i = 0
      while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
      math.sqrt(s)
    }

    def assign(v: ArrayData): Long = {
      // extract the vector ONCE (widened): the k×dim inner loop then runs
      // over two flat double arrays the JIT can keep in registers, instead
      // of k× repeated ArrayData.getFloat calls per input row
      val n = v.numElements()
      val x = new Array[Double](n)
      var vs = 0.0
      var i = 0
      while (i < n) {
        val e = v.getFloat(i).toDouble
        x(i) = e
        vs += e * e
        i += 1
      }
      val vnorm = math.sqrt(vs)
      var bestId = ids(0)
      var best = cdist(x, 0, vnorm)
      var c = 1
      while (c < ids.length) {
        val d = cdist(x, c, vnorm)
        // strict < keeps the lower id on ties; a non-NaN distance displaces
        // a NaN one (struct-min semantics: NaN sorts last)
        if (d < best || (java.lang.Double.isNaN(best) && !java.lang.Double.isNaN(d))) {
          best = d
          bestId = ids(c)
        }
        c += 1
      }
      bestId
    }

    /** Top-`nprobe` centroid ids ascending by (distance, id) — a bounded
      * insertion scan (nprobe is a small constant), so per-row cost stays
      * k×dim for the distances + k×nprobe comparisons, no allocation
      * beyond the result. Tie/NaN ordering identical to [[assign]]: the
      * scan visits ids ascending and displaces only on STRICT improvement,
      * so equal distances keep the lower id first and NaN ranks last. */
    def assignTop(v: ArrayData, nprobe: Int): ArrayData = {
      val n = v.numElements()
      val x = new Array[Double](n)
      var vs = 0.0
      var i = 0
      while (i < n) {
        val e = v.getFloat(i).toDouble
        x(i) = e
        vs += e * e
        i += 1
      }
      val vnorm = math.sqrt(vs)
      val m = math.min(nprobe, ids.length)
      val bd = new Array[Double](m)
      val bi = new Array[Long](m)
      var filled = 0
      var c = 0
      while (c < ids.length) {
        val d = cdist(x, c, vnorm)
        // first slot this candidate beats (strict: ties and NaN-vs-NaN
        // keep the earlier — lower-id — entry)
        var j = 0
        while (j < filled &&
          !(d < bd(j) || (java.lang.Double.isNaN(bd(j)) && !java.lang.Double.isNaN(d)))) {
          j += 1
        }
        if (j < m) {
          var t = math.min(filled, m - 1)
          while (t > j) { bd(t) = bd(t - 1); bi(t) = bi(t - 1); t -= 1 }
          bd(j) = d
          bi(j) = ids(c)
          if (filled < m) filled += 1
        }
        c += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        java.util.Arrays.copyOf(bi, filled))
    }

    private def cdist(x: Array[Double], c: Int, vnorm: Double): Double = {
      val cv = vecs(c)
      // same contract as fvec_dot: mismatched dims error, never truncate
      require(x.length == cv.length,
        s"nearest_centroid: vector dim ${x.length} != centroid dim ${cv.length}")
      val m = cv.length
      var dot = 0.0
      var i = 0
      while (i < m) {
        dot += x(i) * cv(i).toDouble
        i += 1
      }
      if (euclidean) norms(c) * norms(c) - 2.0 * dot
      else -(dot / (vnorm * norms(c)))
    }
  }
}
