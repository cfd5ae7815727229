package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{DedupOps, MultimodalOps, SampleOps, SimilarityOps, TextOps}
import graft.model.{Fixtures, Tables}
import graft.operators.{ChangeOps, EventOps, KubeOps, ListingOps, Relational, TimeOps}

/** multimodal [EXT] slice of the driver registry — split from the
  * monolithic SparkEntry (r14 judge #7). PURE move: faces, oracle SQL,
  * and registry entries are verbatim; SparkEntry composes the family
  * maps and RegistryOrderSpec pins that the composed registry's key
  * set AND iteration order are identical to the pre-split literal
  * (REGISTRY_ORDER.txt). */
private[graft] object MultimodalRegistry {

  private def sqlStr(s: String): String = CpFaces.sqlStr(s)


  // Planted image fixtures (ext.MultimodalOps.Fixtures): byte lengths
  // and checksums interpolate from the actual fixture bytes; the
  // DIMENSIONS are hand-asserted literals — if the Spark-side header
  // parser misreads a PNG IHDR or JPEG SOF, the hash check fails.
  private[graft] def mmFix = graft.ext.MultimodalOps.Fixtures

  private[graft] def mmMd5(b: Array[Byte]): String = mmFix.md5hex(b)

  private[graft] def mmSynthW(len: Int): Long = 64L + len % 640L

  private[graft] def mmSynthH(len: Int): Long = 64L + (len * 7L) % 480L

  private lazy val mmPlantedMetaValues: String = {
    val c = mmFix.corruptPng.length
    s"""(CAST(-1 AS BIGINT), CAST(${mmFix.png64x48.length} AS BIGINT), '${mmMd5(mmFix.png64x48)}', 'png', CAST(64 AS BIGINT), CAST(48 AS BIGINT), CAST(0 AS BIGINT)),
       |    (CAST(-2 AS BIGINT), CAST(${mmFix.jpeg320x240.length} AS BIGINT), '${mmMd5(mmFix.jpeg320x240)}', 'jpeg', CAST(320 AS BIGINT), CAST(240 AS BIGINT), CAST(0 AS BIGINT)),
       |    (CAST(-3 AS BIGINT), CAST($c AS BIGINT), '${mmMd5(mmFix.corruptPng)}', 'synthetic', CAST(${mmSynthW(c)} AS BIGINT), CAST(${mmSynthH(c)} AS BIGINT), CAST(${c * 40L} AS BIGINT)),
       |    (CAST(-4 AS BIGINT), CAST(${mmFix.mp4Video.length} AS BIGINT), '${mmMd5(mmFix.mp4Video)}', 'mp4', CAST(640 AS BIGINT), CAST(360 AS BIGINT), CAST(2500 AS BIGINT))""".stripMargin
  }

  private lazy val mmPlantedDimValues: String = {
    val c = mmFix.corruptPng.length
    s"""(CAST(-1 AS BIGINT), CAST(64 AS BIGINT), CAST(48 AS BIGINT)),
       |    (CAST(-2 AS BIGINT), CAST(320 AS BIGINT), CAST(240 AS BIGINT)),
       |    (CAST(-3 AS BIGINT), CAST(${mmSynthW(c)} AS BIGINT), CAST(${mmSynthH(c)} AS BIGINT)),
       |    (CAST(-4 AS BIGINT), CAST(640 AS BIGINT), CAST(360 AS BIGINT))""".stripMargin
  }

  private lazy val mmPlantedAudioValues: String = {
    def synth(id: Long, b: Array[Byte]): String = {
      val len = b.length.toLong
      val ch = 1L + len % 2L
      s"(CAST($id AS BIGINT), CAST($len AS BIGINT), '${mmMd5(b)}', 'synthetic', CAST(16000 AS BIGINT), CAST($ch AS BIGINT), CAST(16 AS BIGINT), CAST(${len * 1000L / (16000L * ch * 2L)} AS BIGINT))"
    }
    val a = mmFix.wavStereo8k
    val b = mmFix.wavMono44k
    s"""(CAST(-11 AS BIGINT), CAST(${a.length} AS BIGINT), '${mmMd5(a)}', 'wav', CAST(8000 AS BIGINT), CAST(2 AS BIGINT), CAST(16 AS BIGINT), CAST(50 AS BIGINT)),
       |    (CAST(-12 AS BIGINT), CAST(${b.length} AS BIGINT), '${mmMd5(b)}', 'wav', CAST(44100 AS BIGINT), CAST(1 AS BIGINT), CAST(8 AS BIGINT), CAST(100 AS BIGINT)),
       |    ${synth(-13L, mmFix.corruptWav)}""".stripMargin
  }

  private lazy val mmAudioMetaSql: String =
    s"""SELECT doc_id AS media_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  md5(text) AS checksum, 'synthetic' AS kind,
      |  CAST(16000 AS BIGINT) AS sample_rate,
      |  CAST(1 + octet_length(encode(text)) % 2 AS BIGINT) AS channels,
      |  CAST(16 AS BIGINT) AS bits,
      |  CAST(octet_length(encode(text)) * 1000 //
      |       (16000 * (1 + octet_length(encode(text)) % 2) * 2) AS BIGINT) AS duration_ms
      |FROM documents
      |UNION ALL
      |SELECT * FROM (VALUES
      |    $mmPlantedAudioValues
      |) v(media_id, byte_len, checksum, kind, sample_rate, channels, bits, duration_ms)
      |ORDER BY media_id""".stripMargin

  private lazy val mmMediaMetaSql: String =
    s"""SELECT doc_id AS media_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  md5(text) AS checksum, 'synthetic' AS kind,
      |  CAST(64 + octet_length(encode(text)) % 640 AS BIGINT) AS width,
      |  CAST(64 + (octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height,
      |  CAST(octet_length(encode(text)) * 40 AS BIGINT) AS duration_ms
      |FROM documents
      |UNION ALL
      |SELECT * FROM (VALUES
      |    $mmPlantedMetaValues
      |) v(media_id, byte_len, checksum, kind, width, height, duration_ms)
      |ORDER BY media_id""".stripMargin

  private lazy val mmResizeSql: String =
    s"""WITH m AS (SELECT doc_id AS media_id,
      |    CAST(64 + octet_length(encode(text)) % 640 AS BIGINT) AS width,
      |    CAST(64 + (octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height
      |  FROM documents
      |  UNION ALL
      |  SELECT * FROM (VALUES
      |    $mmPlantedDimValues
      |  ) v(media_id, width, height)),
      |s AS (SELECT *, least(256.0 / width, 256.0 / height, 1.0) AS scale FROM m)
      |SELECT media_id, width, height,
      |  CAST(floor(width * scale) AS BIGINT) AS out_width,
      |  CAST(floor(height * scale) AS BIGINT) AS out_height
      |FROM s ORDER BY media_id""".stripMargin

  private lazy val mmFramesSql: String =
    s"""WITH m AS (SELECT doc_id AS media_id,
      |    CAST(octet_length(encode(text)) * 40 AS BIGINT) AS dur
      |  FROM documents
      |  UNION ALL
      |  SELECT CAST(-3 AS BIGINT), CAST(${mmFix.corruptPng.length * 40L} AS BIGINT)
      |  UNION ALL
      |  SELECT CAST(-4 AS BIGINT), CAST(2500 AS BIGINT))
      |SELECT media_id, CAST(frame_ms AS BIGINT) AS frame_ms,
      |       CAST(frame_ms // 40 AS BIGINT) AS frame_index
      |FROM (SELECT media_id, unnest(range(0, dur, 1000)) AS frame_ms FROM m)
      |ORDER BY media_id, frame_ms""".stripMargin

  // mm_frame_dedup: document-backed media only; frame signature = md5
  // over a 16-char text window at the frame index (the deterministic
  // decode stand-in) — duplicate-only report
  private lazy val mmFrameDedupSql: String =
    s"""WITH m AS (SELECT doc_id AS media_id, text,
      |    CAST(octet_length(encode(text)) * 40 AS BIGINT) AS dur
      |  FROM documents),
      |fr AS (SELECT media_id, text,
      |    unnest(range(0, dur, 1000)) AS frame_ms FROM m WHERE dur > 0),
      |sig AS (SELECT media_id,
      |    md5(substring(text, CAST(frame_ms // 40 AS INT) + 1, 16)) AS frame_sig
      |  FROM fr)
      |SELECT frame_sig, count(DISTINCT media_id) AS n_media,
      |  count(*) AS n_frames,
      |  min(media_id) AS min_media, max(media_id) AS max_media
      |FROM sig GROUP BY 1 HAVING count(DISTINCT media_id) >= 2
      |ORDER BY frame_sig""".stripMargin

  private[graft] def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_media_meta" -> ((s, d) => MultimodalOps.mediaMeta(s, d)),
    "mm_audio_meta" -> ((s, d) => MultimodalOps.audioMeta(s, d)),
    "mm_resize" -> ((s, d) => MultimodalOps.resize(s, d)),
    "mm_frames" -> ((s, d) => MultimodalOps.sampleFrames(s, d)),
    // cross-media duplicate frames (the video near-dup primitive)
    "mm_frame_dedup" -> ((s, d) => MultimodalOps.frameDedup(s, d)),
    // the file-granularity landing zone: binaryFile source → decode
    "mm_binary_ingest" -> ((s, d) => MultimodalOps.binaryIngest(s, d))
  )

  private[graft] def oracleSql: Map[String, String] = Map(
    "mm_media_meta" -> mmMediaMetaSql,
    "mm_audio_meta" -> mmAudioMetaSql,
    "mm_resize" -> mmResizeSql,
    "mm_frames" -> mmFramesSql,
    "mm_frame_dedup" -> mmFrameDedupSql,
    // the binaryFile chain must land on the same literal expected
    // metadata as the parquet-column chain
    "mm_binary_ingest" ->
      s"""SELECT * FROM (VALUES
         |    $mmPlantedMetaValues
         |) v(media_id, byte_len, checksum, kind, width, height, duration_ms)
         |ORDER BY media_id""".stripMargin
  )
}
