package graft

import org.apache.spark.sql.functions._

import graft.ext.MultimodalOps
import graft.ext.MultimodalOps.Fixtures

class MultimodalSpec extends SparkSuite {

  test("decode: byte length matches text length, checksum matches md5 (corpus rows)") {
    val meta = MultimodalOps.mediaMeta(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").as("media_id"),
        length(col("text")).cast("long").as("expected_len"),
        md5(col("text")).as("expected_md5"))
    val joined = meta.join(docs, "media_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(r.fieldIndex("byte_len")) == r.getLong(r.fieldIndex("expected_len")))
      assert(r.getString(r.fieldIndex("checksum")) == r.getString(r.fieldIndex("expected_md5")))
      assert(r.getString(r.fieldIndex("kind")) == "synthetic")
    }
  }

  test("PNG IHDR parse: planted 64x48 header decodes to real dimensions") {
    assert(MultimodalOps.parseImageDims(Fixtures.png64x48)
      .contains(("png", 64L, 48L)))
    // and through the full distributed decode path
    val r = MultimodalOps.mediaMeta(spark, sf)
      .filter(col("media_id") === -1L).collect().head
    assert(r.getString(r.fieldIndex("kind")) == "png")
    assert(r.getLong(r.fieldIndex("width")) == 64L)
    assert(r.getLong(r.fieldIndex("height")) == 48L)
    assert(r.getLong(r.fieldIndex("duration_ms")) == 0L)
  }

  test("JPEG SOF parse: marker scan skips APP0 and reads 320x240 from SOF0") {
    assert(MultimodalOps.parseImageDims(Fixtures.jpeg320x240)
      .contains(("jpeg", 320L, 240L)))
    val r = MultimodalOps.mediaMeta(spark, sf)
      .filter(col("media_id") === -2L).collect().head
    assert(r.getString(r.fieldIndex("kind")) == "jpeg")
    assert(r.getLong(r.fieldIndex("width")) == 320L)
    assert(r.getLong(r.fieldIndex("height")) == 240L)
  }

  test("corrupt payload falls back to synthetic features, never throws") {
    assert(MultimodalOps.parseImageDims(Fixtures.corruptPng).isEmpty)
    // truncated mid-segment JPEG and empty payload also parse to None
    assert(MultimodalOps.parseImageDims(Fixtures.jpeg320x240.take(10)).isEmpty)
    assert(MultimodalOps.parseImageDims(Array.emptyByteArray).isEmpty)
    val r = MultimodalOps.mediaMeta(spark, sf)
      .filter(col("media_id") === -3L).collect().head
    assert(r.getString(r.fieldIndex("kind")) == "synthetic")
    val len = Fixtures.corruptPng.length
    assert(r.getLong(r.fieldIndex("width")) == 64L + len % 640L)
    assert(r.getLong(r.fieldIndex("height")) == 64L + (len * 7L) % 480L)
  }

  test("frame sampling: frame count = ceil(duration/1000), strictly increasing") {
    val frames = MultimodalOps.sampleFrames(spark, sf)
    val meta = MultimodalOps.mediaMeta(spark, sf)
      .select(col("media_id"), col("duration_ms"))
    val counts = frames.groupBy("media_id").count()
      .join(meta, "media_id").collect()
    counts.foreach { r =>
      val dur = r.getLong(r.fieldIndex("duration_ms"))
      val expected = (dur + 999) / 1000
      assert(r.getLong(r.fieldIndex("count")) == expected)
    }
  }

  test("frame sampling: zero-duration media yields no rows (no ANSI sequence error)") {
    import spark.implicits._
    val meta = Seq((1L, 0L), (2L, 1500L)).toDF("media_id", "duration_ms")
    val rows = MultimodalOps.frames(meta)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((2L, 0L), (2L, 1000L)))
  }

  test("resize: output dims bounded by 256, aspect preserved within rounding") {
    val rows = MultimodalOps.resize(spark, sf).collect()
    rows.foreach { r =>
      val ow = r.getLong(r.fieldIndex("out_width"))
      val oh = r.getLong(r.fieldIndex("out_height"))
      assert(ow <= 256 && oh <= 256)
      assert(ow >= 1 && oh >= 1)
    }
    // the planted 320x240 JPEG scales by 0.8 to exactly 256x192
    val j = rows.find(_.getLong(0) == -2L).get
    assert(j.getLong(j.fieldIndex("out_width")) == 256L)
    assert(j.getLong(j.fieldIndex("out_height")) == 192L)
  }

  test("MP4 box walk: mvhd duration + tkhd 16.16 dims parse; corrupt falls back") {
    import graft.ext.MultimodalOps.{parseMp4Meta, Fixtures}
    assert(parseMp4Meta(Fixtures.mp4Video) == Some((640L, 360L, 2500L)))
    assert(parseMp4Meta(Fixtures.corruptMp4).isEmpty)
    assert(parseMp4Meta(Fixtures.wavStereo8k).isEmpty) // not BMFF
    // the planted video flows through the decode face with REAL duration,
    // so frame sampling emits ceil(2500/1000) = 3 frames for it
    val f = MultimodalOps.sampleFrames(spark, sf).filter(col("media_id") === -4L)
      .collect().map(_.getLong(1)).toSeq
    assert(f == Seq(0L, 1000L, 2000L))
  }

  test("WAV RIFF parse: chunk walk skips LIST, reads fmt/data, clamps truncation") {
    import graft.ext.MultimodalOps.{parseWavMeta, Fixtures}
    // stereo fixture: LIST chunk sits between fmt and data
    assert(parseWavMeta(Fixtures.wavStereo8k) == Some((8000L, 2L, 16L, 50L)))
    assert(parseWavMeta(Fixtures.wavMono44k) == Some((44100L, 1L, 8L, 100L)))
    // corrupt: RIFF/WAVE signature but no chunks parse
    assert(parseWavMeta(Fixtures.corruptWav).isEmpty)
    // truncated data chunk: declared 1600 bytes but payload cut at 800
    // data bytes -> duration reflects the bytes actually present (25 ms)
    val cut = Fixtures.wavStereo8k.dropRight(800)
    assert(parseWavMeta(cut) == Some((8000L, 2L, 16L, 25L)))
    // not RIFF at all
    assert(parseWavMeta("plain text".getBytes("UTF-8")).isEmpty)
    assert(parseWavMeta(Array.empty[Byte]).isEmpty)
  }

  test("audioMeta face: planted rows parse, corpus rows take the synthetic path") {
    val rows = MultimodalOps.audioMeta(spark, sf).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    val wav = byId(-11L)
    assert(wav.getString(wav.fieldIndex("kind")) == "wav")
    assert(wav.getLong(wav.fieldIndex("sample_rate")) == 8000L)
    assert(wav.getLong(wav.fieldIndex("duration_ms")) == 50L)
    val corrupt = byId(-13L)
    assert(corrupt.getString(corrupt.fieldIndex("kind")) == "synthetic")
    // corpus rows: all synthetic, duration arithmetic holds
    rows.filter(_.getLong(0) >= 0).take(5).foreach { r =>
      val len = r.getLong(r.fieldIndex("byte_len"))
      val ch = r.getLong(r.fieldIndex("channels"))
      assert(ch == 1L + len % 2L)
      assert(r.getLong(r.fieldIndex("duration_ms")) == len * 1000L / (16000L * ch * 2L))
    }
  }
}
