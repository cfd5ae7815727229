package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types

import graft.model.Tables

/** Data-layout clustering ([EXT]): Z-order (Morton) interleaving of two
  * key columns, so range-partitioned + sorted parquet output keeps BOTH
  * dimensions locally dense — min/max row-group statistics then let a
  * scan skip files/row-groups for predicates on either key, not just the
  * leading sort key.
  *
  * Scale notes (100 TB): `clusterByZ` is exactly the write-side layout
  * pass a lakehouse OPTIMIZE ZORDER runs — one `repartitionByRange`
  * shuffle on the z-value (range exchange samples boundaries, so output
  * files are size-balanced even under key skew) + an in-partition sort.
  * The z-value itself is pure bit arithmetic: codegen'd, no UDF, no
  * shuffle.
  */
object LayoutOps {

  /** Spread the low 16 bits of `e` into the even bit positions (classic
    * Morton magic-number sequence), built from Catalyst primitives so
    * the same tree serves the Column face and the SQL function
    * registration (a Column-built tree stays unresolved inside a
    * FunctionBuilder). */
  private def spread16(e: expressions.Expression): expressions.Expression = {
    import expressions.{BitwiseAnd, BitwiseOr, Literal, ShiftLeft}
    def and(a: expressions.Expression, m: Long) = BitwiseAnd(a, Literal(m))
    val a = and(expressions.Cast(e, types.LongType), 0xFFFFL)
    val b = and(BitwiseOr(a, ShiftLeft(a, Literal(8))), 0x00FF00FFL)
    val d = and(BitwiseOr(b, ShiftLeft(b, Literal(4))), 0x0F0F0F0FL)
    val f = and(BitwiseOr(d, ShiftLeft(d, Literal(2))), 0x33333333L)
    and(BitwiseOr(f, ShiftLeft(f, Literal(1))), 0x55555555L)
  }

  /** 32-bit Morton code of two 16-bit values: x in even bits, y in odd
    * (expression face — used by the `zvalue` SQL registration). */
  def zValueExpr(x: expressions.Expression,
                 y: expressions.Expression): expressions.Expression =
    expressions.BitwiseOr(spread16(x),
      expressions.ShiftLeft(spread16(y), expressions.Literal(1)))

  /** Column face of [[zValueExpr]]. */
  def zValue(x: Column, y: Column): Column = {
    val br = org.apache.spark.sql.graftbridge.ColumnBridge
    br.column(zValueExpr(br.expression(x), br.expression(y)))
  }

  /** Cluster `df` for writing: range-partition on the z-value of
    * (xCol, yCol) and sort within partitions, so each output file covers
    * a compact rectangle in (x, y) space. */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
                 numPartitions: Int): DataFrame =
    df.withColumn("__z", zValue(col(xCol), col(yCol)))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")

  /** Query face: split the z(l_partkey, l_suppkey) range into 64 equal
    * slices (the files a z-clustered write would cut) and report each
    * slice's bounding box — the per-file min/max stats. Small bounding
    * boxes per bucket = both keys skippable at scan time. The slice id
    * is exact integer math, `(z·64) div (zmax+1)`, so it is identical at
    * every scale factor and in every engine. */
  def zOrderBuckets(spark: SparkSession, dir: String): DataFrame = {
    val z = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        zValue(col("l_partkey"), col("l_suppkey")).as("zval"))
    val zmax = z.agg(max(col("zval")).as("zmax"))
    z.join(broadcast(zmax))
      .groupBy(expr("(zval * 64) DIV (zmax + 1)").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
        min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
      .orderBy(col("bucket"))
  }
}
