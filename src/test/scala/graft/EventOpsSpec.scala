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
}
