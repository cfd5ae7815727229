package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.plans.AsOfJoin

class AsOfJoinSpec extends SparkSuite {

  test("native as-of join equals the window formulation bit-for-bit") {
    val native = EventOps.lastViewBeforePurchaseNative(spark, sf).collect()
    val window = EventOps.lastViewBeforePurchase(spark, sf).collect()
    assert(native.length == window.length && native.nonEmpty)
    native.zip(window).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("hand-built cases: no prior match -> null, ties absorbed by <=, latest wins") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "lid").repartition(4)
    val right = Seq((1L, 10L, 900L), (1L, 15L, 901L), (1L, 25L, 902L),
      (3L, 1L, 903L)).toDF("rk", "rt", "rid").repartition(4)
    val got = AsOfJoin.asOf(left, right, Seq("k"), Seq("rk"),
        Seq("t"), Seq("rt"))
      .select(col("lid"), col("rid")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // lid 100 (k=1, t=10): rt=10 qualifies via <=
    assert(got(100L) == 900L)
    // lid 101 (k=1, t=20): latest of rt in {10, 15}
    assert(got(101L) == 901L)
    // lid 102 (k=2): no right rows for the key
    assert(got(102L) == -1L)
  }

  test("plan shape: AsOfJoinExec present, no Window, each side sorted after one exchange") {
    val plan = EventOps.lastViewBeforePurchaseNative(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.toLowerCase.contains("window"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 key exchanges, got $exchanges:\n$plan")
  }

  test("forward as-of equals the FOLLOWING-window formulation bit-for-bit") {
    import org.apache.spark.sql.expressions.Window
    val native = EventOps.nextViewAfterPurchase(spark, sf).collect()
    val ev = EventOps.events(spark, sf)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    val reference = ev
      .withColumn("nv", min(when(col("event_type") === "view", col("us"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        expr("us DIV 1000000").as("purchase_epoch"),
        expr("nv DIV 1000000").as("next_view_epoch"))
      .orderBy(col("event_id")).collect()
    assert(native.length == reference.length && native.nonEmpty)
    native.zip(reference).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("forward hand-built: strictly-after match, same right row serves several lefts") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq((1L, 10L, 100L), (1L, 12L, 101L), (1L, 30L, 102L))
      .toDF("k", "t", "lid").repartition(3)
    val right = Seq((1L, 10L, 900L), (1L, 20L, 901L)).toDF("rk", "rt", "rid")
    val got = AsOfJoin.asOf(left, right, Seq("k"), Seq("rk"),
        Seq("t"), Seq("rt"), forward = true)
      .select(col("lid"), col("rid")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // t=10: rt=10 is NOT strictly after; rt=20 is. t=12: rt=20 again.
    assert(got(100L) == 901L && got(101L) == 901L)
    // t=30: nothing after
    assert(got(102L) == -1L)
  }

  test("as-of state stays O(1) per key under many same-key right rows") {
    val spark2 = spark
    import spark2.implicits._
    // one hot key with 10k right rows; every left row still picks the
    // correct latest <= match
    val left = (1L to 100L).map(i => (7L, i * 100L, i)).toDF("k", "t", "lid")
    val right = (0L until 10000L).map(i => (7L, i, i)).toDF("rk", "rt", "rid")
    val got = AsOfJoin.asOf(left, right, Seq("k"), Seq("rk"), Seq("t"), Seq("rt"))
      .select(col("lid"), col("rid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 100L).foreach { i =>
      val want = math.min(i * 100L, 9999L)
      assert(got(i) == want, s"left $i: ${got(i)} != $want")
    }
  }

  test("tolerance: stale backward matches and far forward matches null out") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq((1L, 100L, 1L), (1L, 200L, 2L), (1L, 300L, 3L))
      .toDF("k", "t", "lid").repartition(4)
    val right = Seq((1L, 95L, 900L), (1L, 185L, 901L), (1L, 340L, 902L))
      .toDF("rk", "rt", "rid").repartition(4)
    def run(forward: Boolean, tol: Long): Map[Long, Long] =
      AsOfJoin.asOf(left, right, Seq("k"), Seq("rk"), Seq("t"), Seq("rt"),
          forward = forward, tolerance = Some(tol))
        .select(col("lid"), col("rid")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // backward, tol=10: t=100 matches rt=95 (gap 5); t=200's last is
    // rt=185 (gap 15 > 10) -> null even though rt=95 is same-key;
    // t=300's last is rt=185 (gap 115) -> null
    assert(run(forward = false, tol = 10L) ==
      Map(1L -> 900L, 2L -> -1L, 3L -> -1L))
    // backward, tol=120: gap 15 and 115 both pass
    assert(run(forward = false, tol = 120L) ==
      Map(1L -> 900L, 2L -> 901L, 3L -> 901L))
    // forward, tol=50: t=100 -> rt=185 (gap 85 > 50) null;
    // t=200 -> rt=340 (gap 140) null; t=300 -> rt=340 (gap 40) match
    assert(run(forward = true, tol = 50L) ==
      Map(1L -> -1L, 2L -> -1L, 3L -> 902L))
  }

  test("tolerance query equals the banded window formulation") {
    val native = EventOps.lastViewWithin(spark, sf).collect().map(_.toSeq)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val ev = EventOps.events(spark, sf)
      .filter(col("event_type").isin("view", "purchase"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("lv", max(when(col("event_type") === "view", col("us"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        expr("us DIV 1000000").as("purchase_epoch"),
        expr("CASE WHEN us - lv <= 1800000000 THEN lv DIV 1000000 END")
          .as("last_view_epoch"))
      .orderBy(col("event_id")).collect().map(_.toSeq)
    assert(native.toSeq == ev.toSeq)
  }
}
