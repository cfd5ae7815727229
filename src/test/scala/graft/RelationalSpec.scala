package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Invariant checks for the relational [EXT] core on sf0.001 (the DuckDB
  * oracle pins exact values; these pin structural properties). */
class RelationalSpec extends SparkSuite {

  test("pricing summary covers all (returnflag, linestatus) groups with positive sums") {
    val rows = Relational.pricingSummary(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("sum_qty")) > 0)
      assert(r.getLong(r.fieldIndex("count_order")) > 0)
    }
  }

  test("star join revenue by nation covers every nation exactly once") {
    val rows = Relational.revenueByNation(spark, sf).collect()
    assert(rows.length == 25)
    assert(rows.map(_.getString(1)).distinct.length == 25)
  }

  test("semi and anti joins partition high-value-order customers") {
    val semi = Relational.customersWithBigOrders(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val antiBuild = Relational.customersWithoutOrders(spark, sf)
      .collect().map(_.getLong(0)).toSet
    // anti is w.r.t. >150k orders, semi w.r.t. >100k: semi ⊇ (all − anti)
    assert(semi.intersect(antiBuild).size <= semi.size)
    val total = spark.read.parquet(s"$sf/customer.parquet").count()
    // every customer is in exactly one side of the >150k split
    val semi150 = total - antiBuild.size
    assert(semi150 >= 0 && antiBuild.size <= total)
  }

  test("top-k per group returns at most 3 rows per segment, ranked 1..3") {
    val rows = Relational.topOrdersPerSegment(spark, sf).collect()
    val bySeg = rows.groupBy(_.getString(0))
    bySeg.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to rs.length).toSeq)
      // prices are non-increasing with rank
      val prices = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }

  test("rollup grand-total row equals the sum of leaf rows") {
    val rows = Relational.rollupSummary(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val leaves = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(math.abs(
      grand.head.getDouble(2) - leaves.map(_.getDouble(2)).sum) < 1e-6)
  }

  test("running revenue is non-decreasing within a customer") {
    val rows = Relational.runningRevenuePerCustomer(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val totals = rs.map(_.getDouble(3))
      assert(totals.zip(totals.tail).forall { case (a, b) => b >= a - 1e-9 })
    }
  }

  test("min_by agrees with window-based argmin") {
    val viaMinBy = Relational.oldestOrderPerCustomer(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val viaWindow = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .collect().map(r => r.getLong(r.fieldIndex("o_custkey")) ->
        r.getLong(r.fieldIndex("o_orderkey"))).toMap
    assert(viaMinBy == viaWindow)
  }

  test("from-first-principles HLL (q_sketches) is within 15% of exact NDV") {
    // finalize the shipped mergeable state with the standard corrected
    // estimator (raw harmonic / linear counting), then compare to exact
    val approx = Relational.hllNdv(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Relational.hllEstimate(r.getLong(2), r.getLong(3))).toMap
    val exact = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("o"), countDistinct("l_partkey").as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (k, (o, p)) =>
      assert(math.abs(approx((k, "orders")) - o) / o < 0.15,
        s"flag $k orders: approx=${approx((k, "orders"))} exact=$o")
      assert(math.abs(approx((k, "parts")) - p) / p < 0.15,
        s"flag $k parts: approx=${approx((k, "parts"))} exact=$p")
    }
  }

  test("sketch distinct counts are within 10% of exact") {
    val approx = Relational.sketchSummary(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").agg(countDistinct("l_orderkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k).toDouble - n) / n < 0.1,
        s"flag $k: approx=${approx(k)} exact=$n")
    }
  }

  test("left-outer order summary keeps every customer; zero-order rows coalesce to 0") {
    val rows = Relational.customerOrderSummary(spark, sf).collect()
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(rows.length.toLong == nCust)
    val zeros = rows.filter(_.getLong(1) == 0L)
    zeros.foreach(r => assert(r.getDouble(2) == 0.0))
  }

  test("full-outer nation balances preserve one-sided nations with null other side") {
    val rows = Relational.nationBalanceFullOuter(spark, sf).collect()
    // keys unique after coalesce; at least one side non-null on each row
    assert(rows.map(_.getAs[Number](0).longValue()).distinct.length == rows.length)
    rows.foreach(r => assert(!r.isNullAt(1) || !r.isNullAt(3)))
  }

  test("pivot equals the filtered group-by it denormalizes") {
    val piv = Relational.statusPriorityPivot(spark, sf).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val direct = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority"))
      .agg(Relational.dsum(col("o_totalprice")).as("t")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    direct.foreach { case (k, v) => assert(piv(k).contains(v)) }
  }

  test("correlated-scalar shape: every order's max-priced lineitem(s), no order lost") {
    val res = Relational.maxPricedLineitems(spark, sf)
    val nOrdersWithItems = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey").distinct().count()
    assert(res.select("l_orderkey").distinct().count() == nOrdersWithItems)
  }

  test("quartiles: ntile in 1..4, pct_rank and cume in [0,1], monotone with balance") {
    val rows = Relational.balanceQuartiles(spark, sf)
      .orderBy(col("c_acctbal"), col("c_custkey")).collect()
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= 4))
    val pr = rows.map(_.getDouble(3))
    assert(pr.head == 0.0 && pr.last == 1.0 && pr.sameElements(pr.sorted))
  }

  test("sorted order-key arrays are ascending per customer") {
    val rows = Relational.orderKeyArrays(spark, sf).collect()
    rows.foreach { r =>
      val arr = r.getSeq[Long](1)
      assert(arr == arr.sorted)
    }
  }

  test("CSV face of order-key arrays serializes the typed arrays verbatim") {
    val typed = Relational.orderKeyArrays(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).mkString(",")).toMap
    val csv = Relational.orderKeyArraysCsv(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(csv == typed)
  }

  test("range-partitioned quartiles equal the global-window formulation bit-for-bit") {
    import org.apache.spark.sql.expressions.Window
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    val expected = c.select(
        col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("c_custkey")).collect()
    val actual = Relational.balanceQuartiles(spark, sf).collect()
    assert(actual.length == expected.length)
    actual.zip(expected).foreach { case (a, e) => assert(a == e, s"$a != $e") }
  }

  test("trailing-30-day range frame equals a brute-force per-row recompute") {
    val rows = Relational.trailingSpend(spark, sf).collect()
    val base = spark.read.parquet(s"$sf/orders.parquet").select(
        col("o_custkey"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("d"),
        floor(col("o_totalprice") * lit(100) + lit(0.5)).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCust = base.groupBy(_._1)
    rows.foreach { r =>
      val (ck, d, got) = (r.getAs[Long]("o_custkey"), r.getAs[Long]("day_num"),
        r.getAs[Long]("trailing_cents"))
      val want = byCust(ck).filter(t => t._2 >= d - 30 && t._2 <= d).map(_._3).sum
      assert(got == want, s"cust $ck day $d: $got != $want")
    }
  }

  test("skyline agg+broadcast rewrite equals the quadratic dominance definition") {
    val p = spark.read.parquet(s"$sf/part.parquet").select(
        col("p_partkey").as("id"), col("p_size").cast("long").as("s"),
        floor(col("p_retailprice") * lit(100) + lit(0.5)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = p.filter { case (_, s0, c0) =>
      !p.exists { case (_, s1, c1) =>
        s1 >= s0 && c1 <= c0 && (s1 > s0 || c1 < c0) }
    }.map(t => (t._1, t._2, t._3)).sortBy(t => (t._2, t._1)).toSeq
    val got = Relational.skylineParts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    // frontier sanity: one price per frontier size (ties are co-frontier
    // duplicates), strictly INCREASING with size — a cheaper-or-equal
    // larger point would dominate every smaller frontier point
    val priceBySize = got.groupBy(_._2).view.mapValues(_.map(_._3).distinct).toMap
    priceBySize.values.foreach(v => assert(v.size == 1))
    priceBySize.toSeq.sortBy(_._1).map(_._2.head).sliding(2).foreach {
      case Seq(a, b) => assert(b > a); case _ => ()
    }
  }

  test("half-coverage counts equal a greedy driver-side recompute") {
    val perCust = graft.model.Tables.orders(spark, sf)
      .join(graft.model.Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .join(graft.model.Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .collect()
      .map(r => (r.getAs[String]("n_name"), r.getAs[Long]("c_custkey"),
        r.getAs[Long]("cents")))
    val want = perCust.groupBy(_._1).map { case (nation, rs) =>
      val sorted = rs.sortBy(r => (-r._3, r._2)).map(_._3)
      val total = sorted.sum
      var cum = 0L; var k = 0
      while (2 * cum < total) { cum += sorted(k); k += 1 } // greedy prefix
      nation -> ((rs.length.toLong, total, k.toLong))
    }
    val got = Relational.halfCoverage(spark, sf).collect().map { r =>
      r.getAs[String]("n_name") -> ((r.getAs[Long]("n_customers"),
        r.getAs[Long]("total_cents"), r.getAs[Long]("n_half_coverage")))
    }.toMap
    assert(got == want)
    got.values.foreach { case (n, _, k) => assert(k >= 1 && k <= n) }
  }
}
