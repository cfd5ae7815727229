package graft

import org.apache.spark.sql.functions._

import graft.operators.BasketOps

/** Association-rule invariants (exact values pinned by the
  * q_assoc_rules oracle's relational replay). */
class BasketOpsSpec extends SparkSuite {

  test("rule supports are consistent and lift/conf recompute exactly") {
    val li = graft.model.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val nOrders = li.select(col("ok")).distinct().count()
    val itemSupport = li.groupBy(col("pk")).count().collect()
      .map(r => r.getAs[Long]("pk") -> r.getAs[Long]("count")).toMap
    val rows = BasketOps.associationRules(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= BasketOps.topK)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      val (nAb, nA, nB) = (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(a < b, s"canonical order violated: $a >= $b")
      assert(nAb >= BasketOps.minSupport)
      assert(nA == itemSupport(a) && nB == itemSupport(b))
      assert(nAb <= math.min(nA, nB))
      assert(r.getAs[Double]("conf") == nAb.toDouble / nA.toDouble)
      assert(r.getAs[Double]("lift") ==
        (nAb * nOrders).toDouble / (nA * nB).toDouble)
    }
    // lift-descending with deterministic tie-break
    val lifts = rows.map(r => (-r.getAs[Double]("lift"),
      r.getAs[Long]("a"), r.getAs[Long]("b"))).toSeq
    assert(lifts == lifts.sorted)
  }

  test("pair support matches a naive per-pair count for the top rules") {
    val li = graft.model.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val naive = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("a"), col("y.pk").as("b")).count()
      .collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) -> r.getAs[Long]("count"))
      .toMap
    BasketOps.associationRules(spark, sf).collect().foreach { r =>
      assert(naive((r.getAs[Long]("a"), r.getAs[Long]("b"))) ==
        r.getAs[Long]("n_ab"))
    }
  }
}
