package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Duration / metrics computations (SURVEY.md §2.4 A4–A5).
  *
  * Reference `getJobDuration` (/root/reference/src/helpers.js:65–73):
  * seconds diff, formatted `"{H}h:{MM}mins"` with minutes zero-padded,
  * hours NOT padded, and days truncated via `% 24` — reproduced
  * faithfully, including the `'timestamp error'` fallback for an invalid
  * end timestamp. Golden values: 8100s → "2h:15mins", 3900s →
  * "1h:05mins", 8940s → "2h:29mins" (ingestor.spec.js:355–358).
  */
object TimeOps {

  /** A5: format a seconds duration as the reference does. */
  def formatDurationSeconds(seconds: Column): Column =
    when(seconds.isNull, lit("timestamp error"))
      .otherwise(format_string("%dh:%02dmins",
        floor(seconds / 3600L) % 24L,
        floor(seconds / 60L) % 60L))

  /** A5 over two epoch-second columns; null end ⇒ 'timestamp error'
    * (helpers.js:66). */
  def jobDuration(startEpoch: Column, endEpoch: Column): Column =
    formatDurationSeconds(endEpoch - startEpoch)

  /** Readable-date format used in the metrics doc (ingestor.js:332):
    * moment 'ddd MMM YYYY HH:mm' — Java pattern 'EEE MMM yyyy HH:mm'.
    * (The 'Do' ordinal of ingestor.js:255 has no Java equivalent; we emit
    * plain day-of-month — documented deviation, SURVEY §2.8 F5.) */
  def readableDate(ts: Column): Column =
    date_format(ts, "EEE MMM yyyy HH:mm")

  /** A4 barrier: an ingest is complete when both sink end-timestamps are
    * valid (helpers.js:111). */
  def isComplete(neoEnd: Column, elasticEnd: Column): Column =
    neoEnd.isNotNull && elasticEnd.isNotNull
}
