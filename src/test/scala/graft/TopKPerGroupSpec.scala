package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.plans.TopKPerGroup

/** The custom bounded-heap top-k operator (logical node + strategy +
  * physical exec): plan shape, parity with the window form, and
  * eviction-heavy correctness (exact values pinned by the q_topk_native
  * oracle — the same SQL as the window-based q_topk_per_group). */
class TopKPerGroupSpec extends SparkSuite {

  test("plans as TopKPerGroupExec over one exchange, with no sort") {
    val df = Relational.topOrdersPerSegmentNative(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"custom exec missing:\n$plan")
    // the final .orderBy sorts 15 rows; the operator itself must not:
    // no Sort/Window may appear BELOW the custom node in the tree print
    val below = plan.substring(plan.indexOf("TopKPerGroup"))
    assert(!below.contains("Window"), "window survived under the custom exec")
    assert(!below.replaceFirst("TopKPerGroup", "").contains("Sort"),
      s"sort under the custom operator:\n$below")
  }

  test("equals the window row_number form on the same input") {
    val native = Relational.topOrdersPerSegmentNative(spark, sf)
      .collect().map(_.toSeq).toSeq
    val window = Relational.topOrdersPerSegment(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(native == window)
  }

  test("bounded heap evicts correctly under many updates per group") {
    import spark.implicits._
    // adversarial order: best rows arrive last, forcing k evictions
    val rows = (1 to 1000).map(i => ("g", i.toLong)) ++
      Seq(("h", 5L), ("h", 3L), ("h", 9L))
    val df = spark.sparkContext.parallelize(rows, 7).toDF("grp", "v")
    val out = TopKPerGroup.topK(df, Seq("grp"), Seq("v" -> false), k = 2, "rnk")
      .orderBy("grp", "rnk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("g", 1000L, 1L), ("g", 999L, 2L),
      ("h", 9L, 1L), ("h", 5L, 2L)))
  }

  test("rejects unknown columns with a clear error") {
    import spark.implicits._
    val df = Seq(("a", 1)).toDF("grp", "v")
    intercept[IllegalArgumentException] {
      TopKPerGroup.topK(df, Seq("nope"), Seq("v" -> true), 1)
    }
  }
}
