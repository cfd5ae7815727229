package graft

import java.io.FileOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

/** DataSource V2 ingest format (sources/v2/GraftIngestSource): parity
  * with the imperative loadEntity face, per-file partitioning, column
  * pruning and filter pushdown visible in the executed plan. */
class IngestSourceSpec extends SparkSuite {

  private def writeGz(path: String, content: String): Unit = {
    val f = Paths.get(path)
    Files.createDirectories(f.getParent)
    val out = new GZIPOutputStream(new FileOutputStream(f.toFile))
    out.write(content.getBytes("UTF-8"))
    out.close()
  }

  private def fixture(): String = {
    val dir = Files.createTempDirectory("graft-dsv2").toString
    writeGz(s"$dir/pending/x/person/person_headers.csv.gz",
      "person_id,name,age\n")
    writeGz(s"$dir/pending/x/person/person_sample.csv.gz",
      "1,alice,30\n2,bob,40\n3,carol,50\n")
    dir
  }

  /** The plain spark.read.csv formulation loadEntity used before the
    * v2 source took over — the parity baseline. */
  private def csvFace(dir: String) = {
    val base = s"$dir/pending/x/person"
    val header = spark.read.option("header", "true")
      .csv(s"$base/person_headers.csv.gz")
    spark.read.schema(header.schema).csv(s"$base/person_sample.csv.gz")
  }

  private def readV2(dir: String) =
    spark.read.format("graft-ingest")
      .option("path", s"$dir/pending/x/person").option("entity", "person").load()

  test("v2 source matches the loadEntity DataFrame face row for row") {
    val dir = fixture()
    val v2 = readV2(dir).orderBy(col("person_id")).collect().map(_.toSeq)
    val v1 = csvFace(dir).orderBy(col("person_id")).collect().map(_.toSeq)
    assert(v2.toSeq == v1.toSeq)
    assert(v2.length == 3)
  }

  test("schema comes from the sidecar; extra data files become partitions") {
    val dir = fixture()
    writeGz(s"$dir/pending/x/person/person_sample2.csv.gz", "4,dave,60\n5,erin,70\n")
    val df = readV2(dir)
    assert(df.schema.fieldNames.toSeq == Seq("person_id", "name", "age"))
    assert(df.count() == 5)
    assert(df.rdd.getNumPartitions == 2, "one partition per data file")
  }

  test("column pruning reaches the reader; pushdown filters the scan") {
    val dir = fixture()
    val pruned = readV2(dir).select(col("name"))
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("ReadSchema: struct<name:string>"), planStr)
    val filtered = readV2(dir).filter(col("name") === "bob")
    val fp = filtered.queryExecution.executedPlan.toString
    assert(fp.contains("EqualTo(name,bob)"), fp)
    assert(filtered.collect().map(_.getString(0)).toSeq == Seq("2"))
  }

  test("short rows yield nulls; IsNotNull pushdown drops them in-scan") {
    val dir = fixture()
    writeGz(s"$dir/pending/x/person/person_sample2.csv.gz", "6,frank\n")
    val df = readV2(dir)
    assert(df.filter(col("age").isNull).count() == 1)
    val nn = df.filter(col("age").isNotNull)
    assert(nn.count() == 3)
    assert(nn.queryExecution.executedPlan.toString
      .contains("IsNotNull(age)"))
  }

  test("empty fields read as null, matching spark.read.csv nullValue semantics") {
    val dir = fixture()
    // rewrite the MAIN sample (the csv face reads only that file)
    writeGz(s"$dir/pending/x/person/person_sample.csv.gz",
      "1,alice,30\n7,,80\n")
    val v2 = readV2(dir).filter(col("person_id") === "7").collect().head
    assert(v2.isNullAt(1) && v2.getString(2) == "80")
    val v1 = csvFace(dir).filter(col("person_id") === "7").collect().head
    assert(v1.isNullAt(1) && v1.getString(2) == "80")
  }

  private def streamV2(dir: String) =
    graft.streaming.IngestStream.entityStream(spark, dir, "x", "person")

  test("streaming read shares the DSv2 reader: parity with batch, new files only") {
    val dir = fixture()
    val ckpt = Files.createTempDirectory("graft-dsv2-ckpt").toString
    val batches =
      scala.collection.mutable.ArrayBuffer.empty[Seq[Seq[String]]]
    def drainOnce(): Unit = {
      val q = streamV2(dir).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.collect()
            .map(r => (0 until r.length).map(i =>
              if (r.isNullAt(i)) null else r.getString(i)).toSeq).toSeq
          if (rows.nonEmpty) batches.synchronized { batches += rows }
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
        .start()
      try { q.processAllAvailable() } finally q.stop()
    }
    // poll 1: the first micro-batch consumes every existing file and
    // matches the batch read row for row (single parse path)
    drainOnce()
    val batchRows = readV2(dir).collect()
      .map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) null else r.getString(i)).toSeq).toSeq
    assert(batches.size == 1, s"expected one non-empty micro-batch, got $batches")
    assert(batches.head.sortBy(_.head) == batchRows.sortBy(_.head))
    // poll 2 (restart from the checkpoint, mirroring ingestor.js:54's
    // repeated poll): ONLY the newly-arrived file is consumed — the
    // file-set offset gives per-file exactly-once, even though the new
    // file sorts BEFORE the already-consumed sample
    writeGz(s"$dir/pending/x/person/person_extra.csv.gz", "9,zoe,20\n")
    drainOnce()
    assert(batches.size == 2, s"expected exactly two non-empty micro-batches, got ${batches.size}")
    assert(batches(1) == Seq(Seq("9", "zoe", "20")))
  }

  test("Trigger.AvailableNow drains the source and stops (engine wrapper path)") {
    val dir = fixture()
    val ckpt = Files.createTempDirectory("graft-dsv2-ckpt3").toString
    val out = Files.createTempDirectory("graft-dsv2-out").toString
    val q = streamV2(dir).writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "AvailableNow did not terminate")
    assert(spark.read.parquet(out).count() == 3)
  }

  test("streaming scan keeps pruning and pushdown (one reader, both modes)") {
    val dir = fixture()
    val ckpt = Files.createTempDirectory("graft-dsv2-ckpt2").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = streamV2(dir)
      .filter(col("name") === "bob").select(col("person_id"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen ++= df.collect().map(_.getString(0)).toSeq }
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try { q.processAllAvailable() } finally q.stop()
    assert(seen.toSeq == Seq("2"))
  }
}
