package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** Partitioned writes + partition pruning — the source-layout half of
  * the 100 TB design (PLANS.md): a filter on the partition column must
  * prune directories at planning time, not scan-and-filter. */
class PartitionPruningSpec extends SparkSuite {

  test("filter on the partition column prunes to one partition directory") {
    val dir = tmpDir("graft-part")
    EventOps.events(spark, sf)
      .write.partitionBy("event_type").mode("overwrite")
      .parquet(s"$dir/events_by_type")

    val q = spark.read.parquet(s"$dir/events_by_type")
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
    assert(plan.contains("event_type"),
      s"partition filter should reference event_type:\n$plan")

    val purchaseCount = q.collect().head.getLong(0)
    val expected = EventOps.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(purchaseCount == expected)
    val allFiles = new java.io.File(s"$dir/events_by_type").listFiles()
      .count(_.getName.startsWith("event_type="))
    assert(allFiles == 5, s"expected 5 partition dirs, got $allFiles")
  }
}
