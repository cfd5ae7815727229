package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decode / feature-extract / resize /
  * frame-sample as partition-wise batch transforms.
  *
  * The decode step is a clearly-marked STUB (no image/audio libs in
  * this container — see the builder brief): `decodeStub` produces a
  * deterministic fake feature record from the bytes. Everything
  * AROUND the stub — binary schema, partition-wise batch iteration,
  * typed output schema, the explode shape of frame sampling — is the
  * real Spark plumbing a production decoder would drop into.
  */
object MultimodalOps {

  case class MediaRow(media_id: Long, payload: Array[Byte], mime: String)

  case class MediaMeta(
      media_id: Long,
      byte_len: Long,
      checksum: String,
      // STUB fields: a real decoder would emit true dims/duration
      fake_width: Long,
      fake_height: Long,
      fake_duration_ms: Long)

  /** Manufacture a binary media table from `documents` (payload = UTF-8
    * bytes of the text, standing in for image/audio bytes). */
  def toMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .transform(FanOut(_))
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        lit("application/octet-stream").as("mime"))
      .as[MediaRow]
  }

  /** STUB decoder: partition-wise batch transform (the Scala analogue
    * of mapInPandas — one iterator per partition, no per-row task
    * overhead). A real build replaces the body marked STUB with an
    * actual codec call; the signature, schema and partitioning stay. */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition (batch) scope: a real decoder would init its
      // codec context here, once per partition
      rows.map { r =>
        val len = r.payload.length.toLong
        val md = java.security.MessageDigest.getInstance("MD5")
        val checksum = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaMeta(
          media_id = r.media_id,
          byte_len = len,
          checksum = checksum,
          // STUB: deterministic fakes derived from byte length
          fake_width = 64L + len % 640L,
          fake_height = 64L + (len * 7L) % 480L,
          fake_duration_ms = len * 40L)
      }
    }
  }

  /** Decoded metadata as a DataFrame — oracle-checkable because the
    * stub features are pure arithmetic over byte length + md5. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    decodeStub(toMedia(spark, dir)).toDF().orderBy(col("media_id"))

  /** Frame sampling: one row per sampled frame at `everyMs` intervals —
    * the explode/posexplode shape of video frame extraction. Frame
    * payload extraction is stubbed as a byte-range annotation. */
  def sampleFrames(spark: SparkSession, dir: String,
                   everyMs: Long = 1000L): DataFrame =
    frames(decodeStub(toMedia(spark, dir)).toDF(), everyMs)

  /** Frame explode over a decoded-metadata frame: zero-duration media
    * (e.g. an empty payload) yields NO rows — without the filter,
    * sequence(0, -1, step) throws under ANSI (positive step with
    * start > stop); `greatest(..., 0)` keeps the bound non-negative as
    * belt-and-braces. Mirrors the oracle, where range(0, 0, 1000) is
    * already empty. */
  def frames(meta: DataFrame, everyMs: Long = 1000L): DataFrame =
    meta
      .filter(col("fake_duration_ms") > 0)
      .withColumn("frame_ms",
        explode(sequence(lit(0L),
          greatest(col("fake_duration_ms") - 1, lit(0L)), lit(everyMs))))
      .select(col("media_id"), col("frame_ms"),
        expr("frame_ms DIV 40").as("frame_index"))
      .orderBy(col("media_id"), col("frame_ms"))

  /** Resize stub: pure metadata transform (a real resize maps payload
    * bytes; the metadata arithmetic is what's checkable here). */
  def resizeStub(spark: SparkSession, dir: String,
                 maxDim: Long = 256L): DataFrame = {
    val meta = decodeStub(toMedia(spark, dir)).toDF()
    val scale = least(
      lit(maxDim).cast("double") / col("fake_width"),
      lit(maxDim).cast("double") / col("fake_height"),
      lit(1.0))
    meta.select(col("media_id"), col("fake_width"), col("fake_height"),
        floor(col("fake_width") * scale).cast("long").as("out_width"),
        floor(col("fake_height") * scale).cast("long").as("out_height"))
      .orderBy(col("media_id"))
  }
}
