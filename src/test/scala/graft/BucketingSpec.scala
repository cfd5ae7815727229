package graft

import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins — the 100 TB technique for repeated
  * fact⋈fact joins on the same key: both sides bucketed by the join key
  * ⇒ sort-merge join with NO Exchange (PLANS.md design note, SURVEY
  * §2.3 J4 scale path). */
class BucketingSpec extends SparkSuite {

  test("bucketed-by-join-key tables join without a shuffle exchange") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bkt")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bkt")
    // disable broadcast so the join must pick SMJ, exposing the shuffle
    // (or its absence)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bkt")
        .join(spark.table("o_bkt"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      // the join inputs are pre-bucketed: no Exchange below the join
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      val exchangesBelowJoin = "Exchange hashpartitioning".r
        .findAllIn(joinPart).size
      // one exchange is allowed for the groupBy above the join; the two
      // join inputs themselves must read bucketed (0 exchanges)
      assert(exchangesBelowJoin == 0,
        s"bucketed join should not shuffle its inputs:\n$plan")
      // and the result is correct
      val total = joined.agg(sum("count")).collect().head.getLong(0)
      assert(total == li.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }
}
