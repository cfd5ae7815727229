package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Market-basket association mining over order baskets (reference
  * scope: the engine's analytics surface; this is the frequent-pair /
  * lift primitive behind "customers who bought X also bought Y").
  *
  * Scale shape (100 TB): baskets are built once with a map-side-
  * combining collect_set keyed on basket id; each basket emits its
  * C(k,2) pairs as PACKED longs from the codegen'd PackedPairs kernel
  * (k is small — basket size — so fan-out is bounded), and pair
  * support is a groupBy on one primitive long with partial
  * aggregation. The support filter runs BEFORE any join, so the
  * surviving rule table is candidate-sized, not pair-sized; item
  * supports join onto it (AQE picks broadcast when the item table
  * fits), and the basket total arrives as a broadcast scalar. Lift and
  * confidence are IEEE divisions of exact integer counts — replayable
  * bit-for-bit by any engine while n·N stays under 2^53. */
object BasketOps {

  val minSupport = 2
  val topK = 100

  /** `q_assoc_rules`: top-[[topK]] part pairs by lift among pairs
    * co-occurring in at least [[minSupport]] orders. Output: (a, b,
    * n_ab, n_a, n_b, conf, lift), lift-descending, (a, b) tie-break. */
  def associationRules(spark: SparkSession, dir: String): DataFrame = {
    // pair supports come from the session-shared packed-pair cache
    // (GraphOps.pairSupport — the same table backing the co-occurrence
    // graph family), so the basket build + pair explode + groupBy(ab)
    // materialize once per session, not once per query
    val pairCounts = GraphOps.pairSupport(spark, dir)
      .withColumnRenamed("n", "n_ab")
      .filter(col("n_ab") >= minSupport)
      .select(expr("ab DIV 4294967296L").as("a"),
        pmod(col("ab"), lit(4294967296L)).as("b"), col("n_ab"))
    // per-item order counts and the basket total are one distinct
    // aggregate over the two lineitem key columns — no basket arrays
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val itemCounts = li.groupBy(col("pk").as("item"))
      .agg(count(lit(1)).as("n_item"))
    val nOrders = li.agg(count_distinct(col("ok")).as("n_orders"))
    pairCounts
      .join(itemCounts.select(col("item").as("a"), col("n_item").as("n_a")), "a")
      .join(itemCounts.select(col("item").as("b"), col("n_item").as("n_b")), "b")
      .crossJoin(broadcast(nOrders))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") / col("n_a").cast("double")).as("conf"),
        ((col("n_ab") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(topK)
  }
}
