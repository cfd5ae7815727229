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

  /** Small-file compaction planner (`q_compaction_plan`): the
    * metadata-only pass a lakehouse OPTIMIZE/compaction job runs before
    * moving any data. Input is the file listing (here: one "delta file"
    * per order day, sized at a fixed row estimate); output is the bin
    * manifest — per table partition (month), contiguous runs of small
    * files greedily packed toward `targetBytes`.
    *
    * Bin assignment is the next-fit rule: a file joins the bin its
    * EXCLUSIVE running total falls in (`(cum − bytes) DIV target`), so
    * every bin except a partition's last holds ≥ target bytes once its
    * straddling file closes it — the standard bin-packing approximation
    * compaction services use (optimal packing is NP-hard and
    * order-destroying; next-fit preserves the day ordering, which keeps
    * time-range data-skipping effective after the rewrite).
    *
    * Scale (100 TB): the plan runs on the LISTING, ~#files rows, not on
    * file contents. One exchange total: the explicit repartition(month)
    * satisfies the (month, day) file aggregate (subset clustering), the
    * per-month running-sum window (in-partition sort only), and the
    * final (month, bin) roll-up — three stages, zero further shuffles.
    * All arithmetic is integer, so the manifest replays bit-for-bit in
    * any engine. */
  def compactionPlan(spark: SparkSession, dir: String,
      rowBytes: Int = 128, targetBytes: Long = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val files = Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("day"))
      .withColumn("month", trunc(col("day"), "month"))
      .repartition(col("month"))
      .groupBy(col("month"), col("day"))
      .agg((count(lit(1)) * rowBytes).as("bytes"))
    val w = Window.partitionBy(col("month")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("cum", sum(col("bytes")).over(w))
      .withColumn("bin", expr(s"(cum - bytes) DIV ${targetBytes}L"))
      .groupBy(col("month"), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("total_bytes"),
        min(col("day")).as("first_day"), max(col("day")).as("last_day"))
      .orderBy(col("month"), col("bin"))
  }
}
