package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static kernels for graph pair generation. Same design as
  * TextHashUtil/VectorKernels: one fused JVM loop invoked as a single
  * static call from generated code, replacing an interpreted
  * higher-order `flatten(transform(..., transform(slice(...))))` chain
  * (HOFs never enter whole-stage codegen). */
object GraphKernelUtil {

  /** All C(k,2) packed pairs `a·2³² + b` of a sorted distinct long
    * array, `a` the earlier (smaller) element — so a < b and the pair
    * unpacks with DIV/pmod. Ids must fit 32 bits (enforced by the
    * callers' key domains). Output is a primitive long array: no
    * boxing on the explode path. */
  def packedPairs(ps: ArrayData): ArrayData = {
    val k = ps.numElements()
    val out = new Array[Long](k * (k - 1) / 2)
    var idx = 0
    var i = 0
    while (i < k) {
      val hi = ps.getLong(i) << 32
      var j = i + 1
      while (j < k) {
        out(idx) = hi + ps.getLong(j)
        idx += 1
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `packed_pairs(sorted_longs)`: codegen'd C(k,2) pair packing — the
  * per-group edge generator for co-occurrence graphs
  * (graft.operators.GraphOps.triangleCount). */
case class PackedPairs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "packed_pairs"

  override protected def nullSafeEval(input: Any): Any =
    GraphKernelUtil.packedPairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraphKernelUtil.packedPairs($c)")

  override protected def withNewChildInternal(newChild: Expression): PackedPairs =
    copy(child = newChild)
}
