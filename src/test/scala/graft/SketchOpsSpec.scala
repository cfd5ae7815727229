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
}
