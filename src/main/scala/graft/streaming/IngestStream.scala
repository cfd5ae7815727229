package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.IngestPipeline

/** T1: the reference's 60-second poll loop (ingestor.js:54,80–95) as a
  * Structured Streaming query — a rate source is the clock, and each
  * micro-batch runs one control-loop cycle (`processPendingOnce`).
  * Exactly-once folder consumption (T4) holds because the cycle deletes
  * the folder only after the sinks and the metrics write committed; a
  * crash before the delete replays the folder (at-least-once ⇒ the
  * overwrite sinks make it effectively exactly-once, mirroring the
  * reference's delete-jobs-then-recreate idempotency). */
object IngestStream {

  def start(spark: SparkSession, bucket: String, warehouse: String,
            pollInterval: String = "60 seconds",
            checkpoint: String = "/tmp/graft-ingest-checkpoint"): StreamingQuery = {
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", 1)
      .load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(pollInterval))
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
        IngestPipeline.processPendingOnce(spark, bucket, warehouse)
        ()
      }
      .start()
  }
}
