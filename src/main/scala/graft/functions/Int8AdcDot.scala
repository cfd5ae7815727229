package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: asymmetric-distance (ADC) dot product
  * over int8-quantized codes — `Σ_i codes[i] · weights[i]` with the
  * codes as ARRAY<LONG> (the quantization grid cells) and the weights
  * as ARRAY<DOUBLE> (the query folded with the per-dimension grid
  * scale, precomputed once per query). This is the scan kernel of the
  * int8 serving path (`sim_int8_topk`): the corpus side never
  * dequantizes — one fused multiply-add loop over the 4×-compressed
  * codes, inside whole-stage codegen.
  *
  * Why a custom Expression (SURVEY.md §4.2 escalation ladder): the
  * composable `aggregate(zip_with(...))` form allocates an
  * intermediate array per (query, candidate) pair — exactly the pair
  * cardinality the ANN scan is trying to make cheap.
  *
  * Numeric contract: ascending-index double accumulation of
  * `(double) code_i * w_i`, bit-identical to DuckDB's
  * `list_sum(list_transform(range(1, n+1), i -> CAST(codes[i] AS
  * DOUBLE) * w[i]))` in-order fold — the same equivalence contract
  * every other kernel in this package pins.
  */
case class Int8AdcDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  // declared types matter for the SQL registration: a bare SQL array
  // literal is ARRAY<INT>, and getLong over int-backed ArrayData is
  // garbage — ExpectsInputTypes inserts the cast (or fails analysis
  // with a clear message) instead
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "int8_adc_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val w = b.asInstanceOf[ArrayData]
    val n = math.min(codes.numElements(), w.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += codes.getLong(i).toDouble * w.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getLong($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8AdcDot =
    copy(left = newLeft, right = newRight)
}
