package graft

import org.apache.spark.sql.functions._

import graft.operators.ChangeOps

/** Invariants for changelog compaction and SCD2 range building (exact
  * values are pinned by the q_compact_latest / q_scd2 DuckDB oracles). */
class ChangeOpsSpec extends SparkSuite {

  test("latestByKey keeps exactly one row per key, and it is the max-ordered one") {
    import spark.implicits._
    val log = Seq(
      (1L, 10L, "a", "v1"),
      (1L, 20L, "b", "v2"),
      (1L, 20L, "a", "v2-low-tie"), // tie on ts; id breaks it
      (2L, 5L, "c", "solo")
    ).toDF("key", "ts", "id", "payload")
    val out = ChangeOps.latestByKey(log, Seq("key"), Seq("ts", "id"))
      .orderBy("key").collect()
    assert(out.length == 2)
    assert(out(0).getString(out(0).fieldIndex("id")) == "b")
    assert(out(1).getString(out(1).fieldIndex("payload")) == "solo")
  }

  test("latestEvents plans as a partial+final aggregate, not a windowed sort") {
    val plan = ChangeOps.latestEvents(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("max_by") || plan.contains("HashAggregate") ||
      plan.contains("ObjectHashAggregate"), s"expected aggregate plan, got:\n$plan")
    assert(!plan.contains("Window"), "compaction must not use a window")
  }

  test("latestEvents is one row per user with that user's max (ts, event_id)") {
    val events = graft.operators.EventOps.events(spark, sf)
    val out = ChangeOps.latestEvents(spark, sf)
    assert(out.count() == events.select("user_id").distinct().count())
    val joined = out.alias("l").join(events.alias("e"), "user_id")
      .filter(col("e.ts") > col("l.ts") ||
        (col("e.ts") === col("l.ts") && col("e.event_id") > col("l.event_id")))
    assert(joined.count() == 0, "found an event newer than the compacted pick")
  }

  test("upsert: update rows win, unmatched base rows pass through, no row lost") {
    import spark.implicits._
    val base = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "v", "n")
    val updates = Seq((2L, "B", 99), (4L, "d", 40)).toDF("k", "v", "n")
    val out = ChangeOps.upsert(base, updates, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq == Seq((1L, "a", 10), (2L, "B", 99), (3L, "c", 30), (4L, "d", 40)))
  }

  test("scd2 ranges tile each key's timeline: no overlap, exactly one current") {
    val hist = ChangeOps.orderStatusHistory(spark, sf)
    import spark.implicits._
    val bad = hist.filter(col("valid_to").isNotNull && col("valid_to") < col("valid_from"))
    assert(bad.count() == 0, "valid_to before valid_from")
    val currents = hist.groupBy("o_custkey")
      .agg(sum(when($"is_current", 1).otherwise(0)).as("n_current"))
      .filter($"n_current" =!= 1)
    assert(currents.count() == 0, "each key must have exactly one current version")
    // each non-current version's valid_to equals the next version's valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("valid_from", "o_orderkey")
    val chained = hist.withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(col("valid_to").isNotNull && col("valid_to") =!= col("next_from"))
    assert(chained.count() == 0, "ranges must chain contiguously")
  }
}
