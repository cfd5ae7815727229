package graft

import java.io.{File, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import graft.streaming.IngestStream

/** T1: the poll loop as a real Structured Streaming query — a folder
  * dropped into the bucket is consumed by a later trigger tick. */
class IngestStreamSpec extends SparkSuite {

  private def writeGz(path: String, content: String): Unit = {
    val f = new File(path)
    f.getParentFile.mkdirs()
    val out = new GZIPOutputStream(new FileOutputStream(f))
    out.write(content.getBytes("UTF-8"))
    out.close()
  }

  test("streaming poll loop consumes a folder that arrives mid-stream") {
    val bucket = tmpDir("graft-stream-bucket")
    val wh = tmpDir("graft-stream-wh")
    val checkpoint = tmpDir("graft-stream-ckpt")
    val q = IngestStream.start(spark, bucket, wh,
      pollInterval = "1 second", checkpoint = checkpoint)
    try {
      // bucket is empty for the first tick(s); then an ingest arrives
      Thread.sleep(1500)
      writeGz(s"$bucket/pending/1538055240/person/person_headers.csv.gz",
        "person_id,name\n")
      writeGz(s"$bucket/pending/1538055240/person/person_sample.csv.gz",
        "1,alice\n2,bob\n")
      Files.writeString(Paths.get(s"$bucket/pending/1538055240/bulk.txt"), "")
      Files.writeString(Paths.get(s"$bucket/pending/1538055240/manifest.json"),
        """{"FileName": "person_headers.csv.gz", "SHA256": "aa"}""")
      // wait for a trigger to pick it up and commit (load + metrics + delete)
      val deadline = System.currentTimeMillis() + 60000
      while (Files.exists(Paths.get(s"$bucket/pending/1538055240")) &&
             System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
      }
      assert(!Files.exists(Paths.get(s"$bucket/pending/1538055240")),
        "folder was not consumed within 60s")
      val metrics = spark.read.parquet(s"$wh/es_load_dates")
      assert(metrics.count() == 1)
      assert(metrics.select("ingest").collect().head.getString(0) == "1538055240")
      assert(spark.read.parquet(s"$wh/neo4j/person").count() == 2)
      assert(spark.read.parquet(s"$wh/elastic/person").count() == 2)
    } finally {
      q.stop()
    }
  }
}
