package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** ANALYZE-style table statistics ([EXT]): per-column row/null/NDV/
  * min/max in ONE scan — the stats a cost-based optimizer, a partition
  * pruner, or a data-quality monitor feeds on.
  *
  * Scale notes (100 TB): a single aggregate pass computes every
  * column's stats (Catalyst plans multiple COUNT DISTINCTs as one Expand
  * + partial aggregates — still one scan); the `stack` unpivot to
  * one-row-per-column happens on the single result row, driver-light.
  * Exact NDV is the oracle face; at real scale swap
  * `approx_count_distinct` (HLL++, same plan shape) — the sketch face is
  * `Relational.sketchSummary`.
  */
object StatsOps {

  /** One row of stats per requested column (numeric columns: min/max
    * surfaced as double). */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nonnull"),
        count_distinct(col(c)).as(s"${c}__ndv"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val wide = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__nonnull`, `${c}__ndv`, `${c}__min`, `${c}__max`").mkString(", ")
    wide.select(col("__total"),
        expr(s"stack(${cols.length}, $stackArgs) AS " +
          "(col_name, n_nonnull, ndv, min_val, max_val)"))
      .select(col("col_name"), col("__total").as("n_rows"),
        (col("__total") - col("n_nonnull")).as("n_nulls"),
        col("ndv"), col("min_val"), col("max_val"))
      .orderBy(col("col_name"))
  }

  /** Query face: stats over the orders table's key/measure columns. */
  def orderStats(spark: SparkSession, dir: String): DataFrame =
    columnStats(Tables.orders(spark, dir),
      Seq("o_orderkey", "o_custkey", "o_totalprice"))
}
