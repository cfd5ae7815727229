package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps

class EventOpsSpec extends SparkSuite {

  test("events reader handles both ts physical types (long nanos and native timestamp)") {
    import java.sql.Timestamp
    val spark2 = spark
    import spark2.implicits._
    // the testdata shipped TIMESTAMP(NANOS) (surfacing as a long under
    // nanosAsLong) through round 7 and timestamp[us] from round 8; the
    // reader must accept both. Pin the LongType branch with a synthetic
    // nanos-typed face and the timestamp branch against real testdata.
    val baseUs = 1700000000000000L // 2023-11-14T22:13:20 UTC in micros
    val d = tmpDir("events-nanos")
    Seq((1L, baseUs * 1000L + 999L, 10L, "click", 1.0, "{}"),
        (2L, (baseUs + 30L) * 1000L, 11L, "view", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val nanos = EventOps.events(spark, d)
    assert(nanos.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val got = nanos.orderBy("event_id").select("ts").as[Timestamp].collect()
    // nanos truncate (never round) to micros — DuckDB's NS→US cast
    assert(got(0) == new Timestamp(baseUs / 1000L) ||
      got(0).getTime * 1000L + (got(0).getNanos % 1000000L) / 1000L == baseUs,
      s"nanos face mis-truncated: ${got(0)}")
    assert(nanos.filter(col("ts") === expr(s"timestamp_micros(${baseUs}L)")).count() == 1,
      "the +999ns event must truncate to exactly baseUs micros")
    // the native-timestamp branch: real testdata reads as timestamp too
    assert(EventOps.events(spark, sf).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

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

  test("cohort retention: offset-0 rows cover every user exactly once") {
    val rows = EventOps.cohortRetention(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_week"),
        r.getAs[Long]("week_offset"), r.getAs[Long]("n_users")))
    assert(rows.forall(_._2 >= 0) && rows.forall(_._3 > 0))
    val nUsers = EventOps.events(spark, sf)
      .select(col("user_id")).distinct().count()
    // every user appears in their own cohort's offset-0 cell
    assert(rows.filter(_._2 == 0).map(_._3).sum == nUsers)
    // a cohort's later cells never exceed its offset-0 size
    val at0 = rows.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    rows.foreach { case (c, _, n) => assert(n <= at0(c)) }
  }

  test("markov transitions: rows per source sum to 1.0 and count all steps") {
    val rows = EventOps.eventTransitions(spark, sf).collect()
    val bySrc = rows.groupBy(_.getAs[String]("from_type"))
    bySrc.foreach { case (src, rs) =>
      val p = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(p - 1.0) < 1e-9, s"$src sums to $p")
    }
    val nTransitions = rows.map(_.getAs[Long]("n")).sum
    val ev = EventOps.events(spark, sf)
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(nTransitions == expected)
  }

  test("rfm: quintiles are balanced, code composes digits, scores rank correctly") {
    val rows = EventOps.rfmScores(spark, sf).collect()
    val n = rows.length
    assert(n > 0)
    for (dim <- Seq("r", "f", "m")) {
      val sizes = rows.groupBy(_.getAs[Long](dim)).view.mapValues(_.length)
      assert(sizes.keySet.subsetOf(Set(1L, 2L, 3L, 4L, 5L)))
      sizes.values.foreach(s =>
        assert(s == n / 5 || s == n / 5 + 1, s"$dim bucket size $s"))
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("rfm") ==
        r.getAs[Long]("r") * 100 + r.getAs[Long]("f") * 10 + r.getAs[Long]("m"))
    }
    // m is monotone in (cents, user_id) order
    val byCents = rows.sortBy(r => (r.getAs[Long]("cents"), r.getAs[Long]("user_id")))
      .map(_.getAs[Long]("m"))
    assert(byCents.zip(byCents.tail).forall { case (a, b) => a <= b })
    // the r16 driver-ranked path (what the gate served above) must
    // equal the distributed withGlobalRank chain row-for-row
    val dist = EventOps.rfmScoresGated(spark, sf, useDriverGate = false)
      .collect()
    assert(rows.map(_.toSeq).toSeq == dist.map(_.toSeq).toSeq,
      "driver rfm ranking diverged from the withGlobalRank chain")
  }

  test("concentration deciles: partition users, conserve cents, Lorenz-monotone") {
    val rows = EventOps.concentrationDeciles(spark, sf).collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("n_users"),
        r.getAs[Long]("cents"), r.getAs[Long]("cum_cents")))
    assert(rows.map(_._1).toSeq == (1L to 10L))
    val ev = EventOps.events(spark, sf)
    assert(rows.map(_._2).sum == ev.select(col("user_id")).distinct().count())
    val total = ev.agg(sum(expr("CAST(round(value * 100) AS BIGINT)")))
      .collect().head.getLong(0)
    assert(rows.map(_._3).sum == total && rows.last._4 == total)
    // cum is a prefix sum (per-decile cents need not be monotone when
    // decile sizes differ by the ntile remainder rule)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 == a._4 + b._3)
    }
  }

  test("trigrams: descending top-k, every trigram's count bounded by its bigram") {
    val tri = EventOps.eventTrigrams(spark, sf).collect()
      .map(r => (r.getAs[String]("e1"), r.getAs[String]("e2"),
        r.getAs[String]("e3"), r.getAs[Long]("n")))
    assert(tri.nonEmpty && tri.length <= 25)
    val ns = tri.map(_._4)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    // a trigram (e1,e2,e3) can't outnumber the (e1,e2) transitions
    val bi = EventOps.eventTransitions(spark, sf).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        r.getAs[Long]("n")).toMap
    tri.foreach { case (a, b, _, n) => assert(n <= bi((a, b)), s"$a->$b") }
  }

  test("hourly anomalies: integer flag equals the float 3-sigma test") {
    val rows = EventOps.hourlyAnomalies(spark, sf).collect()
      .map(r => (r.getAs[Long]("hour_start"), r.getAs[Long]("n_events"),
        r.getAs[Boolean]("is_anomaly")))
    assert(rows.nonEmpty)
    // float reference: |x - mean| > 3*stddev_pop
    val xs = rows.map(_._2.toDouble)
    val mean = xs.sum / xs.length
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / xs.length)
    rows.foreach { case (h, x, flag) =>
      assert(flag == math.abs(x - mean) > 3 * sd, s"hour $h x=$x")
    }
    // counts conserve the table size
    assert(rows.map(_._2).sum == EventOps.events(spark, sf).count())
  }

  test("attribution: both models conserve total purchase value") {
    val rows = EventOps.attribution(spark, sf).collect()
    val totalByModel = rows.groupBy(_.getAs[String]("model"))
      .view.mapValues(_.map(_.getAs[Long]("cents")).sum).toMap
    val purchases = EventOps.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("c"),
        count(lit(1)).as("n")).collect().head
    assert(totalByModel("first") == purchases.getAs[Long]("c"))
    assert(totalByModel("last") == purchases.getAs[Long]("c"))
    for (m <- Seq("first", "last")) {
      val n = rows.filter(_.getAs[String]("model") == m)
        .map(_.getAs[Long]("n_purchases")).sum
      assert(n == purchases.getAs[Long]("n"))
    }
  }

  test("conversion lag: buckets count every purchase with a prior view") {
    val rows = EventOps.conversionLag(spark, sf).collect()
      .map(r => r.getAs[Long]("lag_minutes") -> r.getAs[Long]("n"))
    assert(rows.forall(_._1 >= 0))
    // naive recompute per user on the driver
    val ev = EventOps.events(spark, sf)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("us")))
    val naive = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      var lastView: Option[Long] = None
      es.sortBy(e => (e._4, e._2)).flatMap { e =>
        if (e._3 == "view") { lastView = Some(e._4); None }
        else lastView.map(lv => (e._4 - lv) / 60000000L)
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.toMap == naive)
  }

  test("interval overlap equals the naive theta join") {
    val got = EventOps.intervalOverlap(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("n_incidents"), r.getAs[Long]("overlap_us")))
    val ev = EventOps.events(spark, sf).withColumn("us", unix_micros(col("ts")))
    val act = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min(col("us")).as("a_start"), max(col("us")).as("a_end"))
    val inc = ev.filter(col("event_type") === "error" &&
        pmod(expr("CAST(round(value * 100) AS BIGINT)"), lit(97)) === 0)
      .select((col("us") - 300000000L).as("b_start"),
        (col("us") + 300000000L).as("b_end"))
    val naive = act.crossJoin(inc)
      .filter(col("a_start") <= col("b_end") && col("b_start") <= col("a_end"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n"), sum(least(col("a_end"), col("b_end")) -
        greatest(col("a_start"), col("b_start"))).as("ov"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("n"), r.getAs[Long]("ov")))
    assert(got.toSet == naive.toSet)
    assert(got.nonEmpty && got.forall(_._4 >= 0))
  }

  test("CUSUM flags a planted rate shift and matches the max(0,·) recurrence exactly") {
    import spark.implicits._
    import java.sql.Timestamp
    // type "a": 5 events/day for days 0-19, then 30/day for days 20-29
    val day0 = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val rows = (0 until 30).flatMap { d =>
      val perDay = if (d < 20) 5 else 30
      (0 until perDay).map { i =>
        (d * 100L + i, new Timestamp(day0 + d * 86400000L + i * 1000L),
          1L, "a", 1.0, "{}")
      }
    }
    val dir = tmpDir("graft-cusum")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.cusumShift(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getBoolean(5)))
    assert(got.length == 30)
    // reference max(0, S + dev) recurrence over the same scaled devs
    val total = 20 * 5 + 10 * 30 // 400
    var s = 0L
    val want = got.map { case (_, c, _, _, _) =>
      s = math.max(0L, s + (30L * c - total))
      s
    }
    assert(got.map(_._4).toSeq == want.toSeq)
    // the shift is flagged exactly from the second high-rate day on
    // (cusum 500, 1000, ... all exceed total = 400)
    assert(got.count(_._5) == 10)
    assert(got.filter(_._5).map(_._1).min == got.map(_._1).sorted.apply(20))
  }

  test("seasonality: planted weekly shape recovered, spike day is its dow's peak") {
    import spark.implicits._
    // 4 full weeks: weekday volumes 10·(1+dow), except ONE spiked day
    // (day 10: 3× its weekday volume). day_num dow convention: epoch
    // day % 7 (day 0 = Thursday).
    val day0Num = 19800L // a day divisible by arithmetic below; dow = 19800 % 7
    val rows = (0 until 28).flatMap { d =>
      val dayNum = day0Num + d
      val dow = dayNum % 7
      val base = 10 * (dow.toInt + 1)
      val n = if (d == 10) base * 3 else base
      (0 until n).map { i =>
        (d * 1000L + i,
          new java.sql.Timestamp(dayNum * 86400000L + i * 1000L),
          1L, "a", 1.0, "{}")
      }
    }
    val dir = tmpDir("graft-season")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.seasonality(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.length == 7 && got.map(_._1).toSeq == (0L to 6L))
    val spikeDayNum = day0Num + 10
    val spikeDow = spikeDayNum % 7
    got.foreach { case (dow, nDays, total, meanMicro, peakDay, peakResid) =>
      assert(nDays == 4L)
      val base = 10L * (dow + 1)
      if (dow == spikeDow) {
        // mean = (3·base + 3·base)/4 = 1.5·base; the spike day peaks
        assert(total == 6L * base && meanMicro == base * 1500000L)
        assert(peakDay == spikeDayNum && peakResid == 3L * base * 1000000L - meanMicro)
      } else {
        // flat weekdays: zero residual everywhere, tie → earliest day
        assert(total == 4L * base && meanMicro == base * 1000000L)
        assert(peakResid == 0L && peakDay % 7 == dow)
      }
    }
  }

  test("cusum: zero-event outage days appear in the dense grid and shift the reference mean") {
    import spark.implicits._
    // 20 days at 10/day, a 10-day outage (NO events), 10 days at 10/day
    val day0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val rows = ((0 until 20) ++ (30 until 40)).flatMap { d =>
      (0 until 10).map { i =>
        (d * 100L + i,
          new java.sql.Timestamp(day0 + d * 86400000L + i * 1000L),
          1L, "a", 1.0, "{}")
      }
    }
    val dir = tmpDir("graft-cusum-gap")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.cusumShift(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
    // DENSE: 40 rows including the 10 zero-event outage days
    assert(got.length == 40)
    val byDay = got.sortBy(_._1)
    assert(byDay.slice(20, 30).forall(_._2 == 0L), "outage days present with 0 events")
    // recurrence replay over the dense series: total 300, n_days 40
    var s = 0L
    val want = byDay.map { case (_, c, _) =>
      s = math.max(0L, s + (40L * c - 300L)); s
    }
    assert(byDay.map(_._3).toSeq == want.toSeq)
    // the post-outage resumption (rate above the outage-diluted mean)
    // accumulates positive deviations — the monitor sees the shift
    assert(want.last > want(29))
  }

  test("weekend chi2: independent mix scores ~0, planted weekend-only type scores high") {
    import spark.implicits._
    // 14 days (2 full weeks). Type "flat" fires 10/day every day;
    // type "wknd" fires 10/day ONLY on weekend days (dow 2 or 3).
    val day0 = 19800L
    val rows = (0 until 14).flatMap { d =>
      val dayNum = day0 + d
      val wknd = dayNum % 7 == 2 || dayNum % 7 == 3
      val flat = (0 until 10).flatMap { i =>
        Seq((d * 100L + i, new java.sql.Timestamp(dayNum * 86400000L + i * 1000L),
            1L, "flat", 1.0, "{}"),
          (d * 100L + 20 + i,
            new java.sql.Timestamp(dayNum * 86400000L + (i + 20) * 1000L),
            1L, "flat2", 1.0, "{}"))
      }
      val extra = if (wknd) (0 until 10).map { i =>
        (d * 100L + 50 + i,
          new java.sql.Timestamp(dayNum * 86400000L + (i + 50) * 1000L),
          1L, "wknd", 1.0, "{}")
      } else Seq.empty
      flat ++ extra
    }
    val dir = tmpDir("graft-chi2")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.weekendChi2(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    // flat/flat2: 40 weekend (4 wknd days) / 100 weekday; wknd: 40 / 0
    val (fa, fb, fShare, base, fChi) = got("flat")
    val (wa, wb, wShare, _, wChi) = got("wknd")
    assert((fa, fb) == ((40L, 100L)) && (wa, wb) == ((40L, 0L)))
    assert(fShare == 40L * 1000000L / 140L && wShare == 1000000L)
    assert(base == 120L * 1000000L / 320L)
    // exact 2x2 chi2 replay, same double tree
    def chi2(a: Long, b: Long, c: Long, d: Long): Double = {
      val det = a * d - b * c
      val v = ((a + b + c + d).toDouble * det.toDouble * det.toDouble) /
        ((a + b).toDouble * (c + d).toDouble *
          (a + c).toDouble * (b + d).toDouble)
      java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    }
    assert(fChi == chi2(40, 100, 80, 100) && wChi == chi2(40, 0, 80, 200))
    // the planted weekend-only type is far more significant than the
    // two flat types (whose mix deviates only via the complement)
    assert(wChi > fChi && got("flat2")._5 == fChi)
  }
}
