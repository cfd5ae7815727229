package graft

import graft.operators.SketchOps

/** Count-Min sketch invariants (exact values pinned by the q_cms
  * oracle's full DuckDB replay). */
class SketchOpsSpec extends SparkSuite {

  test("CMS estimates are one-sided and near-exact at this load factor") {
    val rows = SketchOps.cmsFrequency(spark, sf).collect()
    assert(rows.length == SketchOps.cmsProbeK)
    val n = graft.model.Tables.orders(spark, sf).count()
    val slack = 5 * n / SketchOps.cmsWidth + 1
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_cnt")
      val est = r.getAs[Long]("cms_est")
      // collisions only ever ADD counts — the CMS one-sided guarantee
      assert(est >= exact, s"underestimate for ${r}")
      // min over depth rows keeps the overshoot near E[N/w]
      assert(est - exact <= slack, s"overshoot ${est - exact} > $slack: $r")
    }
  }

  test("CMS is deterministic across runs") {
    val a = SketchOps.cmsFrequency(spark, sf).collect().map(_.toSeq).toSeq
    val b = SketchOps.cmsFrequency(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("bottom-k quantile sketch: sample sizes exact, estimates near exact quantiles") {
    import org.apache.spark.sql.functions._
    val li = graft.model.Tables.lineitem(spark, sf)
    val sizes = li.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rows = SketchOps.bottomKQuantiles(spark, sf).collect()
    assert(rows.length == sizes.size)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      assert(r.getAs[Long]("n_sample") ==
        math.min(SketchOps.bkSampleK.toLong, sizes(flag)))
      val est = r.getAs[Double]("p50_est")
      val m = exact(flag)
      // k=1024 uniform sample: sampling error ~1/sqrt(k); generous 10%
      assert(math.abs(est - m) / m < 0.10, s"$flag: est=$est exact=$m")
      assert(r.getAs[Double]("p25_est") <= est &&
        est <= r.getAs[Double]("p75_est"))
    }
  }

  test("KMV estimates land in the ~1/sqrt(k) band; set algebra is consistent") {
    // sf0.001 sets are smaller than k, so this exercises the exact-mode
    // branch; the extrapolating branch is covered at sf0.01+ by the
    // oracle gate (and by the relative-error assert when it applies
    val r = SketchOps.kmvDistinct(spark, "/root/testdata/sf0.01").collect().head
    val k = r.getAs[Long]("k").toDouble
    val band = 3.0 / math.sqrt(k) // ~3 sigma
    for (s <- Seq("1995", "1996", "union")) {
      val est = r.getAs[Double](s"est_$s")
      val exact = r.getAs[Long](s"exact_$s").toDouble
      assert(math.abs(est - exact) / exact < band, s"$s: $est vs $exact")
    }
    // inclusion-exclusion consistency and sane bounds
    val ei = r.getAs[Double]("est_intersect")
    assert(ei == r.getAs[Double]("est_1995") + r.getAs[Double]("est_1996")
      - r.getAs[Double]("est_union"))
    assert(ei > 0 && ei <= math.min(r.getAs[Double]("est_1995"),
      r.getAs[Double]("est_1996")) * (1 + band))
    // small-set exact mode: sf0.001 populations are below k
    val small = SketchOps.kmvDistinct(spark, sf).collect().head
    for (s <- Seq("1995", "1996", "union")) {
      assert(small.getAs[Double](s"est_$s") == small.getAs[Long](s"exact_$s").toDouble,
        s"small-set $s should be exact")
    }
  }
}
