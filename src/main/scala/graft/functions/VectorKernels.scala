package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

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
