package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomOps

/** Bloom-prefiltered join: result parity + the filter actually prunes
  * and sits on the probe scan (exact values pinned by q_bloom_join). */
class BloomOpsSpec extends SparkSuite {

  test("bloom-prefiltered join result equals the plain join") {
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_totalprice") > 400000)
    val plain = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .orderBy("l_orderkey", "l_linenumber")
      .collect()
    val bloomed = BloomOps.bloomPrefilteredJoin(l, o, "l_orderkey", "o_orderkey")
      .orderBy("l_orderkey", "l_linenumber")
      .collect()
    assert(bloomed.length == plain.length)
    assert(bloomed.toSeq == plain.toSeq)
  }

  test("the might_contain predicate prunes most probe rows before the join") {
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_totalprice") > 450000)
    val bf = o.stat.bloomFilter("o_orderkey", 1L << 17, 0.01)
    val total = l.count()
    val prefiltered = l.collect().count(r => bf.mightContainLong(r.getLong(0)))
    // ~10% of orders selected => ~10% of lineitems survive (+ fpp slack)
    assert(prefiltered < total / 5,
      s"bloom kept $prefiltered of $total — not selective")
  }

  test("plan shape: might_contain filters the probe side under the join") {
    val plan = BloomOps.highValueOrderRevenue(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom predicate in plan:\n$plan")
  }
}
