package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Static kernels for centroid scoring (IVF assign/probe). Same design
  * as TextHashUtil: one fused JVM loop invoked as a single static call
  * from generated code, replacing an interpreted
  * `transform(array_sort(transform(<k-literal-struct-array>, ...)))`
  * chain. Beyond per-row speed, the big win is PLAN size: the literal
  * formulation re-embeds k×dim float literals in every operator that
  * scores centroids, and each Lloyd's round re-analyzes that plan — the
  * kernel carries the matrix as one broadcast-by-reference object
  * instead.
  */
object VectorKernels {

  /** Top-`keep` centroid ids by (cosine desc, cid asc). `matrix` is the
    * row-major flattening of the centroid vectors in ascending-cid order
    * (`cids(r)` is the id of row r). Cosine accumulates products and
    * squared norms in ascending index order — the same numeric contract
    * as CosineSimilarity, so assignments are bit-identical to the
    * composable struct-sort form (SimilaritySpec pins parity). NaN
    * scores (zero-norm vectors) rank last, matching `array_sort` on the
    * negated-cosine struct where NaN sorts greatest. */
  def topCentroids(vec: ArrayData, matrix: Array[Float], cids: Array[Int],
                   keep: Int): ArrayData = {
    val k = cids.length
    val dim = if (k == 0) 0 else matrix.length / k
    val n = math.min(vec.numElements(), dim)
    val v = new Array[Double](n)
    var nv = 0.0
    var i = 0
    while (i < n) {
      val x = vec.getFloat(i).toDouble
      v(i) = x
      nv += x * x
      i += 1
    }
    val scores = new Array[Double](k)
    var r = 0
    while (r < k) {
      var dot = 0.0
      var nc = 0.0
      var j = 0
      val off = r * dim
      while (j < n) {
        val c = matrix(off + j).toDouble
        dot += v(j) * c
        nc += c * c
        j += 1
      }
      scores(r) = dot / (math.sqrt(nv) * math.sqrt(nc))
      r += 1
    }
    val m = math.min(keep, k)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var o = 0
    while (o < m) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var r2 = 0
      while (r2 < k) {
        // strict > with ascending r2 gives (score desc, cid asc); NaN
        // never wins a comparison, so NaN rows fill last
        if (!taken(r2) && (best == -1 || scores(r2) > bestScore)) {
          best = r2
          bestScore = scores(r2)
        }
        r2 += 1
      }
      taken(best) = true
      out(o) = cids(best)
      o += 1
    }
    new GenericArrayData(out)
  }

  /** All-plane dot products (see [[PlaneDots]] for the numeric/null
    * contract). A length mismatch or a null element poisons EVERY dot
    * (zip_with pads the shorter side with null and one null poisons
    * the whole fold), so the result is an array of nPlanes NULLS —
    * exactly the composable `array(planeDot(0), planeDot(1), …)`
    * shape, NOT a null array (a null array would vanish downstream
    * `explode`s where the composable form still emits rows). */
  def planeDots(vec: ArrayData, matrix: Array[Double], nPlanes: Int): ArrayData = {
    val dim = matrix.length / nPlanes
    val n = vec.numElements()
    def poisoned = new GenericArrayData(Array.fill[Any](nPlanes)(null))
    if (n != dim) return poisoned
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return poisoned
      v(i) = vec.getFloat(i).toDouble
      i += 1
    }
    val out = new Array[Double](nPlanes)
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      val off = p * dim
      var j = 0
      while (j < n) { acc += v(j) * matrix(off + j); j += 1 }
      out(p) = acc
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Spark SQL's `dot > 0`: NaN is GREATER than any numeric in Spark's
    * comparison semantics (unlike the JVM, where NaN compares false),
    * and a null dot takes the when/otherwise(0) branch. */
  @inline private def sqlGtZero(dot: Double): Boolean =
    dot > 0 || java.lang.Double.isNaN(dot)

  /** Packed sign-bit bucket (see [[PlaneSignBits]]): bit p set iff
    * dot p > 0 under SPARK comparison semantics (NaN sets the bit); a
    * poisoned (all-null) dot vector packs to 0, matching the
    * composable when/otherwise sum. */
  def planeSignBits(vec: ArrayData, matrix: Array[Double], nPlanes: Int): Long = {
    val dots = planeDots(vec, matrix, nPlanes)
    if (dots.isNullAt(0)) return 0L
    var bits = 0L
    var p = 0
    while (p < nPlanes) {
      if (sqlGtZero(dots.getDouble(p))) bits |= (1L << p)
      p += 1
    }
    bits
  }

  /** Query-directed multi-probe bucket list (see [[ProbeBuckets]]):
    * from one table's plane dots, the `probeSeq` probe buckets — own
    * signature XOR each kept flip mask. Mirrors the composable
    * struct-sort pipeline exactly: low-|dot| planes by (|d|, p) asc,
    * flip subsets scored by Σd², kept by (score, subset-id) asc; sign
    * bits use Spark's NaN-greater-than-zero comparison; double sort
    * comparisons via the NaN-greatest total order array_sort uses.
    *
    * POISONED dots (all null — a degenerate vector): the composable
    * pipeline still emits a full probe list — own bucket 0, all
    * |dot| ties break by plane index so lowP = planes 0..probePlanes-1,
    * and every g>0 subset score is null while g=0 scores 0.0; Spark's
    * ascending sort is NULLS FIRST, so the kept masks are
    * g = 1, 2, 3, … (by subset id) with g=0 LAST — i.e. buckets
    * 1..probeSeq, wrapping to 0 only when the whole lattice is kept.
    * Reproduced verbatim (and spec-pinned) so degenerate query vectors
    * keep emitting the same rows as the oracle's composable SQL. */
  def probeBuckets(dots: ArrayData, probePlanes: Int, probeSeq: Int): ArrayData = {
    val nPlanes = dots.numElements()
    if (nPlanes > 0 && dots.isNullAt(0)) {
      val nSub = 1 << probePlanes
      val out = new Array[Long](probeSeq)
      var i = 0
      while (i < probeSeq) {
        out(i) = if (i + 1 < nSub) (i + 1).toLong else 0L
        i += 1
      }
      return new GenericArrayData(out)
    }
    val d = new Array[Double](nPlanes)
    var own = 0L
    var i = 0
    while (i < nPlanes) {
      d(i) = dots.getDouble(i)
      if (sqlGtZero(d(i))) own |= (1L << i)
      i += 1
    }
    // probePlanes plane indices with smallest |dot|, ties by index asc
    val byAbs = (0 until nPlanes).sortBy(p => (math.abs(d(p)), p))(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))
    val lowP = byAbs.take(probePlanes).toArray
    // score every flip subset by Σ d² of its flipped planes
    val nSub = 1 << probePlanes
    val score = new Array[Double](nSub)
    val mask = new Array[Long](nSub)
    var g = 0
    while (g < nSub) {
      var s = 0.0
      var m = 0L
      var b = 0
      while (b < probePlanes) {
        if ((g & (1 << b)) != 0) {
          val dp = d(lowP(b))
          s += dp * dp
          m |= (1L << lowP(b))
        }
        b += 1
      }
      score(g) = s
      mask(g) = m
      g += 1
    }
    val kept = (0 until nSub).sortBy(g2 => (score(g2), g2))(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))
      .take(probeSeq)
    val out = new Array[Long](kept.size)
    var o = 0
    kept.foreach { g2 => out(o) = own ^ mask(g2); o += 1 }
    new GenericArrayData(out)
  }
}

/** `plane_dots(vec)`: all `nPlanes` hyperplane dots of `vec` in one
  * call — result(p) = Σ_j vec(j)·matrix(p·dim + j), accumulated
  * left-to-right in double, the identical fold order and float→double
  * widening as the composable `aggregate(zip_with(vec, plane, x·w))`
  * form, so every dot is bit-equal (SimilaritySpec pins parity). The
  * composable form also nulls out on ANY length mismatch or null
  * element (zip_with pads the shorter side with null and one null
  * poisons the fold) — mirrored here exactly. The plane matrix rides
  * as a reference object, so the analyzed plan is O(1) in
  * nPlanes×dim instead of one 64-term HOF fold per plane — at 45
  * planes the fold form's ~3000-node tree made plan ANALYSIS, not row
  * throughput, the dominant cost of the LSH query side. */
case class PlaneDots(child: Expression, matrix: Array[Double], nPlanes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nPlanes >= 1 && matrix.length % nPlanes == 0,
    "matrix must hold one row per plane")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  // a poisoned input yields an array of NULL dots (never a null
  // array) — the composable array(planeDot…) shape, so downstream
  // explodes keep emitting rows on degenerate vectors
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "plane_dots"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.planeDots(input.asInstanceOf[ArrayData], matrix, nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("planeMatrix", matrix, "double[]")
    defineCodeGen(ctx, ev,
      in => s"graft.functions.VectorKernels.planeDots($in, $m, $nPlanes)")
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneDots =
    copy(child = newChild)
}

/** `plane_sign_bits(vec)`: the packed LSH bucket — bit p set iff plane
  * p's dot is strictly positive UNDER SPARK SQL COMPARISON SEMANTICS,
  * where NaN is greater than any numeric (so a NaN dot SETS its bit —
  * the JVM's NaN-compares-false would silently diverge from the
  * composable `when(planeDot > 0, …)` and the oracle SQL). A null dot
  * (length mismatch / null element) takes the otherwise-branch, so the
  * bucket degrades to 0, never null. One static call per row replaces
  * nPlanes 64-term folds in the signature build. */
case class PlaneSignBits(child: Expression, matrix: Array[Double], nPlanes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nPlanes >= 1 && nPlanes <= 63 && matrix.length % nPlanes == 0,
    "matrix must hold one row per plane, bits must fit a long")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "plane_sign_bits"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.planeSignBits(input.asInstanceOf[ArrayData], matrix, nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("planeMatrix", matrix, "double[]")
    defineCodeGen(ctx, ev,
      in => s"graft.functions.VectorKernels.planeSignBits($in, $m, $nPlanes)")
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneSignBits =
    copy(child = newChild)
}

/** `probe_buckets(dots)`: the multi-probe bucket list for one LSH
  * table, fused (see VectorKernels.probeBuckets for the contract). The
  * composable form built ~1500 interpreted HOF nodes (struct sorts
  * over the 2^probePlanes flip lattice) that the analyzer re-walked on
  * every run of the LSH query side. Poisoned (all-null) dots still
  * emit the full degenerate probe list 1..probeSeq, wrapping to 0 only
  * when the whole lattice is kept (the NULLS-FIRST struct sort puts
  * bucket 0 — the no-flip subset's NULL score — last) — exactly what
  * the composable struct-sort pipeline produces, so degenerate query
  * vectors keep their rows. */
case class ProbeBuckets(child: Expression, probePlanes: Int, probeSeq: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(probeSeq >= 1 && probeSeq <= (1 << probePlanes),
    "probe sequence must be within the subset lattice")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "probe_buckets"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.probeBuckets(input.asInstanceOf[ArrayData], probePlanes, probeSeq)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      in => s"graft.functions.VectorKernels.probeBuckets($in, $probePlanes, $probeSeq)")

  override protected def withNewChildInternal(newChild: Expression): ProbeBuckets =
    copy(child = newChild)
}

/** `top_centroid_ids(vec)`: ids of the `keep` nearest centroids by
  * cosine, ties broken by ascending id. The centroid matrix rides in
  * the expression as a reference object (not literal children), so the
  * analyzed plan stays O(1) in k×dim. */
case class TopCentroidIds(child: Expression, matrix: Array[Float],
                          cids: Array[Int], keep: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(cids.nonEmpty && matrix.length % cids.length == 0,
    "matrix must hold one row per centroid id")
  require(keep >= 1, "keep must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_centroid_ids"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.topCentroids(input.asInstanceOf[ArrayData], matrix, cids, keep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centMatrix", matrix, "float[]")
    val c = ctx.addReferenceObj("centIds", cids, "int[]")
    defineCodeGen(ctx, ev,
      in => s"graft.functions.VectorKernels.topCentroids($in, $m, $c, $keep)")
  }

  override protected def withNewChildInternal(newChild: Expression): TopCentroidIds =
    copy(child = newChild)
}
