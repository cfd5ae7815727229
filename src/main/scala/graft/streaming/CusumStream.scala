package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.EventOps

/** Streaming CUSUM rate-shift monitor — the batch `ev_cusum` face
  * promoted to an incrementally-maintained view plus an alert sink
  * (r11 judge #6).
  *
  * Split of labor (the IncrementalAgg lesson): the only data-sized work
  * in the CUSUM chain is the raw-event scan that builds the
  * (event_type, day_num) count table — and counts are a monoid, so the
  * stream maintains THAT table by merging per-batch partials. The
  * statistic itself (dense-grid fill, prefix-sum recurrence, flags) is
  * calendar-days × types sized, so each batch simply re-derives it from
  * the maintained table via the SAME [[EventOps.cusumFromDaily]] the
  * batch face uses — streamed ≡ batch by construction, with the view
  * merge as the only thing left to prove (CusumStreamSpec replays a
  * split stream and compares against the one-shot batch statistic).
  *
  * Unlike IncrementalAgg's bucket-partitioned view, this view is NOT
  * bucketed: it is bounded by calendar × |types| (thousands of rows at
  * any horizon), so a full rewrite per batch is cheaper than partition
  * bookkeeping. Replay safety is the IncrementalAgg guard: _last_batch
  * records the last applied id; a replayed batch is a no-op, so counts
  * never double-merge.
  *
  * The alert sink is ScoreStream-style serving: after each merge the
  * current flagged (type, day) rows overwrite `alertDir` — the monitor
  * page a pipeline polls, always reflecting the full-history statistic.
  */
object CusumStream {

  /** Maintain the daily-count view from `events` (needs `ts` and
    * `event_type` columns) and keep the alert page fresh. */
  def maintain(events: DataFrame, viewDir: String, alertDir: String,
               trigger: Trigger = Trigger.AvailableNow(),
               checkpointDir: Option[String] = None): StreamingQuery = {
    val base = events.writeStream.outputMode("append")
    checkpointDir.foreach(base.option("checkpointLocation", _))
    base
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
        val metaPath = new Path(s"$viewDir/_last_batch")
        val lastApplied: Long =
          if (fs.exists(metaPath)) {
            val in = fs.open(metaPath)
            try new String(in.readAllBytes(), "UTF-8").trim.toLong
            finally in.close()
          } else -1L
        if (batchId > lastApplied) {
          val delta = EventOps.dailyTypeCounts(batch.toDF()).localCheckpoint()
          val dataPath = new Path(s"$viewDir/data")
          val merged =
            if (fs.exists(dataPath))
              spark.read.parquet(dataPath.toString)
                .unionByName(delta)
                .groupBy(col("event_type"), col("day_num"))
                .agg(sum(col("n_events")).as("n_events"))
                .localCheckpoint()
            else delta
          merged.write.mode("overwrite").parquet(dataPath.toString)
          // alert page: full-history statistic over the merged view
          EventOps.cusumFromDaily(merged)
            .filter(col("shift_flag"))
            .write.mode("overwrite").parquet(alertDir)
          val out = fs.create(metaPath, true)
          try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
        }
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** The full streamed statistic (not just flagged rows) from the
    * maintained view — what CusumStreamSpec compares against the batch
    * face. */
  def readStatistic(spark: org.apache.spark.sql.SparkSession,
                    viewDir: String): DataFrame =
    EventOps.cusumFromDaily(spark.read.parquet(s"$viewDir/data"))

  /** The seasonality profile served from the SAME maintained view: the
    * (type, day) counts sum over types back to the per-day table the
    * batch face aggregates (counts are a monoid in both groupings), so
    * one maintained view feeds both monitors. */
  def readSeasonality(spark: org.apache.spark.sql.SparkSession,
                      viewDir: String): DataFrame =
    EventOps.seasonalityFromDaily(
      spark.read.parquet(s"$viewDir/data")
        .groupBy(col("day_num"))
        .agg(sum(col("n_events")).as("n_events")))
}
