package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Change-data-capture shapes a lakehouse/training-data pipeline needs:
  * changelog compaction (latest record per key — the read face of an
  * upsert) and SCD2 effective-range building ([EXT]; the reference's
  * delta-vs-bulk ingest distinction, ingestor.js:36–40, is the same
  * changelog-vs-snapshot split, lifted to row granularity).
  *
  * Scale notes (100 TB):
  *  - `latestByKey` is a hash aggregate (`max_by` over a struct), so it
  *    partial-aggregates map-side: each input partition is first compacted
  *    to one candidate row per key locally, and only those survivors
  *    shuffle. A window `row_number` formulation would shuffle EVERY row
  *    and sort it; the aggregate form shuffles at most
  *    (#keys × #partitions) rows and never sorts.
  *  - `scd2` genuinely needs every version row ordered per key, so it IS
  *    the window shape: one shuffle on the key, sort within partitions
  *    only (no global sort).
  */
object ChangeOps {

  /** Latest record per key: keep, for each key, the row with the greatest
    * `orderCols` tuple (lexicographic struct ordering — pass a unique
    * tiebreaker last for determinism). */
  def latestByKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    val ord = struct(orderCols.map(col).toIndexedSeq: _*)
    df.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(max_by(payload, ord).as("__latest"))
      .select(col("__latest.*"))
  }

  /** Query face: compact the events changelog to each user's latest event
    * ((ts, event_id) max — event_id is unique, so the pick is total). */
  def latestEvents(spark: SparkSession, dir: String): DataFrame =
    latestByKey(EventOps.events(spark, dir), Seq("user_id"), Seq("ts", "event_id"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))

  /** SCD2 history from a changelog: each change row becomes a version with
    * `valid_from` = its own timestamp and `valid_to` = the next change's
    * timestamp for the same key (null ⇒ current version). */
  def scd2(df: DataFrame, keyCols: Seq[String], tsCol: String,
           tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col).toIndexedSeq: _*)
      .orderBy(col(tsCol), col(tieBreak))
    df.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** MERGE/upsert: apply `updates` to `base` — for each key, the updates
    * row wins; base rows without an update pass through. `updates` must
    * hold at most one row per key (compact a changelog with
    * `latestByKey` first). Scale: the anti-join broadcasts the update
    * KEYS (narrow), so the base side never shuffles; the union is a
    * no-shuffle bag append. This is the write-side companion of
    * `latestByKey` (the read-side compaction). */
  def upsert(base: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame = {
    val keys = updates.select(keyCols.map(col).toIndexedSeq: _*).distinct()
    base.join(broadcast(keys), keyCols, "left_anti")
      .unionByName(updates)
  }

  /** Query face: price corrections for all high-value orders (status
    * forced to 'X'), merged over the orders table. */
  def correctedOrders(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val updates = orders.filter(col("o_totalprice") > 450000)
      .withColumn("o_orderstatus", lit("X"))
    upsert(orders, updates, Seq("o_orderkey"))
      .orderBy(col("o_orderkey"))
  }

  /** Query face: per-customer order-status history as SCD2 ranges. */
  def orderStatusHistory(spark: SparkSession, dir: String): DataFrame =
    scd2(Tables.orders(spark, dir), Seq("o_custkey"), "o_orderdate", "o_orderkey")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy(col("o_custkey"), col("valid_from"), col("o_orderkey"))
}
