package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.operators.EventOps
import graft.streaming.CusumStream

/** MemoryStream row for CusumStreamSpec — top level because `.as[CusumEv]`
  * deserialization cannot reach an inner class's outer scope. */
final case class CusumEv(ts: java.sql.Timestamp, event_type: String)

/** Streaming CUSUM: the incrementally-maintained daily view re-derives
  * the EXACT batch statistic after a chunked replay of the event
  * stream, and the replay guard makes re-applied batches no-ops. */
class CusumStreamSpec extends SparkSuite {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toSeq).toSeq

  test("chunked stream replay reproduces the batch CUSUM bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = EventOps.events(spark, sf)
      .select($"ts".cast("timestamp"), $"event_type")
      .as[CusumEv].collect().toSeq
    assert(rows.nonEmpty)
    // three uneven chunks so day totals genuinely MERGE across batches
    // (the same calendar day appears in more than one chunk)
    val chunks = Seq(
      rows.take(rows.size / 3),
      rows.slice(rows.size / 3, rows.size / 2),
      rows.drop(rows.size / 2))
    val base = tmpDir("graft-cusum-stream")
    val viewDir = s"$base/view"
    val alertDir = s"$base/alerts"

    val input = MemoryStream[CusumEv]
    val q = CusumStream.maintain(input.toDF(), viewDir, alertDir,
      Trigger.ProcessingTime(0))
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val streamed = canon(CusumStream.readStatistic(spark, viewDir))
    val batch = canon(EventOps.cusumShift(spark, sf))
    assert(streamed == batch,
      s"streamed(${streamed.size}) != batch(${batch.size})")

    // the alert page is exactly the flagged slice of the statistic
    val alerts = spark.read.parquet(alertDir)
    val flagged = CusumStream.readStatistic(spark, viewDir)
      .filter(org.apache.spark.sql.functions.col("shift_flag"))
    assert(canon(alerts.orderBy("event_type", "day_num")) ==
      canon(flagged.orderBy("event_type", "day_num")))

    // the seasonality profile served from the SAME view equals its
    // batch face (one maintained view feeds both monitors)
    assert(canon(CusumStream.readSeasonality(spark, viewDir)) ==
      canon(EventOps.seasonality(spark, sf)),
      "view-served seasonality differs from the batch face")

    // replay guard: a fresh query (batch ids restart at 0) re-feeding a
    // chunk must NOT double-merge — _last_batch already covers id 0
    val input2 = MemoryStream[CusumEv]
    val q2 = CusumStream.maintain(input2.toDF(), viewDir, alertDir,
      Trigger.ProcessingTime(0))
    try {
      input2.addData(chunks.head)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(canon(CusumStream.readStatistic(spark, viewDir)) == batch,
      "replayed batch double-merged into the view")
  }
}
