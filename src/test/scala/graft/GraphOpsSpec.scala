package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Fixed-point PageRank invariants (exact ranks pinned by the
  * q_pagerank oracle's unrolled-round replay). */
class GraphOpsSpec extends SparkSuite {

  test("rank mass is conserved up to the deterministic truncation leak") {
    val rows = GraphOps.pageRank(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("r")).sum
    val scale = 1000000000000L
    // initial floor-div + per-round truncations leak strictly less than
    // (nodes + edges) units of 1e-12 mass per round
    val n = rows.length.toLong
    assert(total <= scale)
    assert(scale - total < 4 * (n + 200000L),
      s"leak too large: ${scale - total}")
    assert(rows.forall(_.getAs[Long]("r") > 0))
  }

  test("well-connected suppliers outrank leaf parts") {
    val ranks = GraphOps.pageRank(spark, sf)
    // suppliers (odd ids) each serve many parts; parts (even ids) link to
    // few suppliers — supplier mean rank must dominate
    val bySide = ranks.groupBy((col("node") % 2).as("side"))
      .agg(avg(col("r")).as("mean_r"))
      .collect().map(r => r.getAs[Long]("side") -> r.getAs[Double]("mean_r")).toMap
    assert(bySide(1L) > bySide(0L) * 5,
      s"supplier ranks should dominate: $bySide")
  }

  test("pageRank is deterministic across runs") {
    val a = GraphOps.pageRank(spark, sf).collect().map(_.toSeq).toSeq
    val b = GraphOps.pageRank(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
