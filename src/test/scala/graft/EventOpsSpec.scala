package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps

class EventOpsSpec extends SparkSuite {

  test("tumbling windows partition all events; counts sum to table size") {
    val total = EventOps.events(spark, sf).count()
    val winTotal = EventOps.tumblingCounts(spark, sf)
      .agg(sum("n")).collect().head.getLong(0)
    assert(winTotal == total)
  }

  test("sliding windows double-count each event (10min window, 5min slide)") {
    val total = EventOps.events(spark, sf).count()
    val slideTotal = EventOps.slidingCounts(spark, sf)
      .agg(sum("n")).collect().head.getLong(0)
    assert(slideTotal == 2 * total)
  }

  test("sessions: no intra-session gap exceeds 5 minutes; session count ≤ event count") {
    val sessions = EventOps.sessionize(spark, sf).collect()
    val total = EventOps.events(spark, sf).count()
    assert(sessions.map(_.getLong(4)).sum == total) // n_events partitions events
    sessions.foreach { s =>
      val span = s.getLong(3) - s.getLong(2)  // end - start seconds
      val n = s.getLong(4)
      // span of an n-event session with max gap 300s is < 300*n
      assert(span <= 300L * n, s"session $s spans too long")
    }
  }

  test("as-of: last view is at or before the purchase") {
    val rows = EventOps.lastViewBeforePurchase(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(3))
        assert(r.getLong(3) <= r.getLong(2),
          s"view ${r.getLong(3)} after purchase ${r.getLong(2)}")
    }
  }

  test("native session_window agrees with lag-based sessionize up to exact-gap ties") {
    // both close a session after >5min of silence; they may only differ
    // on events at EXACTLY the gap (native starts a new session, lag
    // keeps the old one), so native sessions >= lag sessions and event
    // totals match
    val lagBased = EventOps.sessionize(spark, sf).agg(
      count(lit(1)), sum(col("n_events"))).head()
    val native = EventOps.sessionWindowStats(spark, sf).agg(
      count(lit(1)), sum(col("n_events"))).head()
    assert(native.getLong(1) == lagBased.getLong(1), "event totals differ")
    assert(native.getLong(0) >= lagBased.getLong(0))
    // session bounds sane: start < exclusive end, positive counts
    EventOps.sessionWindowStats(spark, sf).collect().foreach { r =>
      assert(r.getLong(1) < r.getLong(2))
      assert(r.getLong(3) >= 1)
    }
  }

  test("salted join equals the plain join row-for-row") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val plain = o.join(c, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val salted = graft.operators.SkewOps.saltedJoin(o, c,
        "o_custkey", "c_custkey")
      .select("o_orderkey", "c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(salted == plain)
  }

  test("range join: click counts are non-negative and bounded by user's clicks") {
    val ev = EventOps.events(spark, sf)
    val clicksPerUser = ev.filter(col("event_type") === "click")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = EventOps.clicksBeforeErrors(spark, sf).collect()
    rows.foreach { r =>
      val n = r.getLong(2)
      assert(n >= 0)
      assert(n <= clicksPerUser.getOrElse(r.getLong(1), 0L))
    }
  }

  test("ewma features: depth-1 is the raw value, deeper terms only add") {
    val d1 = EventOps.ewmaFeatures(spark, sf, depth = 1).collect()
    d1.foreach { r =>
      assert(r.getAs[Long]("ewma_cents") == r.getAs[Long]("cents"))
    }
    val d8 = EventOps.ewmaFeatures(spark, sf, depth = 8).collect()
    val k1 = d1.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("seq")) ->
      r.getAs[Long]("ewma_cents")).toMap
    d8.foreach { r =>
      val base = k1((r.getAs[Long]("user_id"), r.getAs[Long]("seq")))
      val e = r.getAs[Long]("ewma_cents")
      // lag terms are nonnegative, so deeper depth can only increase
      assert(e >= base, s"$r vs depth-1 $base")
    }
  }

  test("rolling 7-day distinct actives: expand rewrite equals per-day brute force") {
    val byDay = EventOps.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = byDay.map(_._2).distinct
    val want = days.map { day =>
      day -> byDay.filter { case (_, d) =>
        !d.isAfter(day) && !d.isBefore(day.minusDays(6)) }.map(_._1).distinct.length.toLong
    }.toMap
    val got = EventOps.rollingDistinctUsers(spark, sf).collect()
    assert(got.length == days.length)
    got.foreach { r =>
      val day = r.getDate(0).toLocalDate
      assert(r.getAs[Long]("active_7d") == want(day), s"$day")
    }
  }

  test("gap fill densifies each user's span, LOCF holds, lerp is bounded and exact at endpoints") {
    val rows = EventOps.gapFill(spark, sf).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (u, rs) =>
      val days = rs.map(_.getDate(1).toLocalDate).sorted
      // contiguous: exactly one row per day between first and last
      assert(days.distinct.length == days.length, s"user $u dup days")
      assert(
        java.time.temporal.ChronoUnit.DAYS.between(days.head, days.last)
          == days.length - 1, s"user $u has holes")
      val sortedRs = rs.sortBy(_.getDate(1).toLocalDate.toEpochDay)
      // between two observations, locf is constant (= previous observed)
      // and lerp moves monotonically between the two observed values
      var lastObserved = 0L
      sortedRs.foreach { r =>
        val locf = r.getAs[Long]("locf_cents")
        val lerp = r.getAs[Long]("lerp_cents")
        if (r.getAs[Boolean]("is_observed")) {
          assert(locf == lerp, s"user $u observed row locf != lerp")
          lastObserved = locf
        } else {
          assert(locf == lastObserved, s"user $u LOCF drifted")
        }
      }
      // lerp endpoints: strictly within [min, max] of the two bracketing
      // observations (integer floor keeps it in range)
      val observed = sortedRs.filter(_.getAs[Boolean]("is_observed"))
        .map(r => r.getDate(1).toLocalDate -> r.getAs[Long]("locf_cents"))
      sortedRs.filterNot(_.getAs[Boolean]("is_observed")).foreach { r =>
        val d = r.getDate(1).toLocalDate
        val prev = observed.filter(_._1.isBefore(d)).last
        val next = observed.find(_._1.isAfter(d)).get
        val lo = math.min(prev._2, next._2)
        val hi = math.max(prev._2, next._2)
        val lerp = r.getAs[Long]("lerp_cents")
        assert(lerp >= lo && lerp <= hi, s"user $u lerp out of range")
        // exact: floor(prev + (next-prev)*offset/gap)
        val gap = java.time.temporal.ChronoUnit.DAYS.between(prev._1, next._1)
        val off = java.time.temporal.ChronoUnit.DAYS.between(prev._1, d)
        val want = prev._2 + Math.floorDiv((next._2 - prev._2) * off, gap)
        assert(lerp == want, s"user $u lerp mismatch")
      }
    }
    assert(rows.nonEmpty)
  }
}
