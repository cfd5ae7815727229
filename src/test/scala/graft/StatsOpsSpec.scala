package graft

import org.apache.spark.sql.functions._

import graft.operators.StatsOps

/** Column-stats collection: null/NDV accounting and the one-scan plan
  * (exact values pinned by the q_table_stats oracle). */
class StatsOpsSpec extends SparkSuite {

  test("columnStats counts nulls and NDV correctly") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 1.5), (2L, null), (2L, 2.5), (null, 2.5)
    ).toDF("k", "v")
    val rows = StatsOps.columnStats(df, Seq("k", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    val k = rows("k")
    assert(k.getAs[Long]("n_rows") == 4 && k.getAs[Long]("n_nulls") == 1 &&
      k.getAs[Long]("ndv") == 2 && k.getAs[Double]("min_val") == 1.0 &&
      k.getAs[Double]("max_val") == 2.0)
    val v = rows("v")
    assert(v.getAs[Long]("n_nulls") == 1 && v.getAs[Long]("ndv") == 2)
  }

  test("orderStats reads the orders table exactly once") {
    val plan = StatsOps.orderStats(spark, sf).queryExecution.executedPlan.toString
    val scans = "FileScan|BatchScan".r.findAllIn(plan).length
    assert(scans == 1, s"expected one scan, got $scans:\n$plan")
  }

  test("histograms: widths tile the domain, depths balance counts, both cover all rows") {
    val k = StatsOps.histBuckets
    val rows = StatsOps.priceHistograms(spark, sf).collect()
    val (width, depth) = rows.partition(_.getAs[String]("kind") == "width")
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(width.map(_.getAs[Long]("n")).sum == total)
    assert(depth.map(_.getAs[Long]("n")).sum == total)
    assert(depth.length == math.min(k.toLong, total))
    // depth buckets: counts differ by at most 1; buckets ordered by value
    val dcounts = depth.map(_.getAs[Long]("n"))
    assert(dcounts.max - dcounts.min <= 1, dcounts.mkString(","))
    val dsorted = depth.sortBy(_.getAs[Long]("bucket"))
    dsorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"), s"$a overlaps $b")
      case _ => ()
    }
    // width buckets: each bucket's [lo,hi] sits inside its arithmetic range
    width.foreach { r =>
      assert(r.getAs[Long]("lo") <= r.getAs[Long]("hi"))
      assert(r.getAs[Long]("bucket") >= 0 && r.getAs[Long]("bucket") < k)
    }
  }

  test("DQ report: one row per rule; dup-row rule equals a direct group count") {
    val got = StatsOps.dqReport(spark, sf).collect()
      .map(r => r.getAs[String]("rule") -> r.getAs[Long]("n")).toMap
    assert(got.size == 5)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val wantDups = li.groupBy("l_orderkey", "l_linenumber").count()
      .filter(col("count") > 1)
      .agg(sum(col("count") - 1)).collect().head.get(0) match {
        case null => 0L
        case v: Long => v
      }
    assert(got("lineitem_pk_dup_rows") == wantDups)
    // every count is a valid (nonnegative) violation tally
    got.values.foreach(n => assert(n >= 0))
  }

  test("MAD outliers: value-count rewrite equals the brute-force median/MAD definition") {
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      val n = s.length
      s((n - 1) / 2) + s(n / 2)
    }
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderpriority"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val cs = rs.map(_._2).toSeq
      val m2 = med2(cs)
      val devs = cs.map(c => math.abs(2 * c - m2))
      val mad4 = med2(devs)
      g -> ((cs.length.toLong, m2, mad4,
        devs.count(d => 2 * d > 3 * mad4).toLong))
    }
    val got = StatsOps.madOutliers(spark, sf).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    }.toMap
    assert(got == want)
  }

  test("price bands: doubled quartiles match a sorted-array recompute, ordered Q1<=med<=Q3") {
    val data = graft.model.Tables.orders(spark, sf)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("m"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .collect().map(r => (r.getAs[String]("m"), r.getAs[Long]("c")))
    val want = data.groupBy(_._1).map { case (m, rs) =>
      val v = rs.map(_._2).sorted
      val n = v.length
      def qx2(num: Int, den: Int): Long =
        v((num * n + den - 1) / den - 1) + v((num * n) / den)
      m -> ((n.toLong, qx2(1, 4), qx2(1, 2), qx2(3, 4)))
    }
    val got = graft.operators.StatsOps.monthlyPriceBands(spark, sf)
      .collect().map { r =>
        r.getAs[String]("month") -> ((r.getAs[Long]("n"),
          r.getAs[Long]("q1_x2"), r.getAs[Long]("med_x2"), r.getAs[Long]("q3_x2")))
      }.toMap
    assert(got == want)
    got.values.foreach { case (_, q1, med, q3) =>
      assert(q1 <= med && med <= q3)
    }
  }

  test("ship latency: buckets partition lineitem, lags are sane") {
    val rows = graft.operators.StatsOps.shipLatency(spark, sf).collect()
      .map(r => (r.getAs[String]("priority"), r.getAs[Long]("lag_days"),
        r.getAs[Long]("n")))
    assert(rows.map(_._3).sum ==
      graft.model.Tables.lineitem(spark, sf).count())
    assert(rows.forall(_._3 > 0))
    // matches a direct driver-side recompute (note: this synthetic data
    // DOES contain ship-before-order rows — the histogram must keep them)
    val naive = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("d"))
      .collect()
      .groupBy(r => (r.getAs[String]("o_orderpriority"), r.getAs[Long]("d")))
      .view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap == naive)
  }

  test("linreg matches a BigInt-exact recomputation of the closed form") {
    val data = graft.model.Tables.lineitem(spark, sf)
      .join(graft.model.Tables.part(spark, sf),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("x"),
        expr("CAST(round(l_extendedprice) AS BIGINT)").as("y"))
      .collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Long]("x"), r.getAs[Long]("y")))
    val want = data.groupBy(_._1).map { case (b, rs) =>
      val n = BigInt(rs.length)
      val sx = rs.map(r => BigInt(r._2)).sum; val sy = rs.map(r => BigInt(r._3)).sum
      val sxy = rs.map(r => BigInt(r._2) * r._3).sum
      val sxx = rs.map(r => BigInt(r._2) * r._2).sum
      val syy = rs.map(r => BigInt(r._3) * r._3).sum
      // exact sufficient statistics, then the same IEEE tree as the op
      val num = (n * sxy - sx * sy).toDouble; val den = (n * sxx - sx * sx).toDouble
      val slope = num / den
      b -> ((rs.length.toLong, slope,
        (sy.toDouble - slope * sx.toDouble) / n.toDouble,
        (num * num) / (den * (n * syy - sy * sy).toDouble)))
    }
    val got = graft.operators.StatsOps.linregByBrand(spark, sf).collect().map { r =>
      r.getAs[String]("p_brand") -> ((r.getAs[Long]("n"), r.getAs[Double]("slope"),
        r.getAs[Double]("intercept"), r.getAs[Double]("r2")))
    }.toMap
    assert(got == want)
    // r2 is a ratio of squares: always within [0, 1]
    got.values.foreach { case (_, _, _, r2) =>
      assert(r2 >= 0 && r2 <= 1.0)
    }
  }
}
