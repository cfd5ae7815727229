package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewOps

/** Heavy-hitter guarantees under forced Misra-Gries evictions (the
  * q_heavy_hitters oracle pins exact values on the events table). */
class SkewOpsSpec extends SparkSuite {

  test("heavyHitters is exact on a skewed stream even with k << distinct keys") {
    import spark.implicits._
    // 3 hot keys (1000 each) buried in 5000 distinct cold keys (1 each):
    // k=8 counters per partition force constant evictions
    val hot = Seq.fill(1000)(1L) ++ Seq.fill(1000)(2L) ++ Seq.fill(1000)(3L)
    val cold = (100L until 5100L)
    val df = spark.sparkContext.parallelize(hot ++ cold, 7).toDF("k")
    // shareDen=8 ⇒ threshold N/8 = 1000: exactly keys 1,2,3 (each at
    // exactly the threshold — covered because N/8 > N/(k+1) strictly)
    val got = SkewOps.heavyHitters(df, "k", shareDen = 8L, k = 8)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1000L), (2L, 1000L), (3L, 1000L)))
  }

  test("heavyHitters equals the direct groupBy+filter on the events table") {
    val ev = graft.operators.EventOps.events(spark, sf)
    val total = ev.count()
    val direct = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") * 1280 >= total)
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val mg = SkewOps.hotUsers(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mg.toSeq == direct.toSeq)
  }

  test("heavyHitters rejects a shareDen the candidate phase cannot guarantee") {
    import spark.implicits._
    val df = Seq(1L, 2L).toDF("k")
    intercept[IllegalArgumentException] {
      SkewOps.heavyHitters(df, "k", shareDen = 100L, k = 8)
    }
  }
}
