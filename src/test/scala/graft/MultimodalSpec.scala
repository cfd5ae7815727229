package graft

import org.apache.spark.sql.functions._

import graft.ext.MultimodalOps

class MultimodalSpec extends SparkSuite {

  test("decode stub: byte length matches text length, checksum matches md5") {
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
    }
  }

  test("frame sampling: frame count = ceil(duration/1000), strictly increasing") {
    val frames = MultimodalOps.sampleFrames(spark, sf)
    val meta = MultimodalOps.mediaMeta(spark, sf)
      .select(col("media_id"), col("fake_duration_ms"))
    val counts = frames.groupBy("media_id").count()
      .join(meta, "media_id").collect()
    counts.foreach { r =>
      val dur = r.getLong(r.fieldIndex("fake_duration_ms"))
      val expected = (dur + 999) / 1000
      assert(r.getLong(r.fieldIndex("count")) == expected)
    }
  }

  test("frame sampling: zero-duration media yields no rows (no ANSI sequence error)") {
    import spark.implicits._
    val meta = Seq((1L, 0L), (2L, 1500L)).toDF("media_id", "fake_duration_ms")
    val rows = MultimodalOps.frames(meta)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((2L, 0L), (2L, 1000L)))
  }

  test("resize: output dims bounded by 256, aspect preserved within rounding") {
    val rows = MultimodalOps.resizeStub(spark, sf).collect()
    rows.foreach { r =>
      val ow = r.getLong(r.fieldIndex("out_width"))
      val oh = r.getLong(r.fieldIndex("out_height"))
      assert(ow <= 256 && oh <= 256)
      assert(ow >= 1 && oh >= 1)
    }
  }
}
