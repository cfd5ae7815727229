package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Spread the low 16 bits of `c` into the even bit positions (classic
    * Morton magic-number sequence). */
  private def spread16(c: Column): Column = {
    val a = c.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x33333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit values: x in even bits, y in odd. */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

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
