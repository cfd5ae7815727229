package graft

import java.io.{File, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

/** Shared S3-bucket fixture builders for the ingest specs
  * (IngestPipelineSpec, SinkContractSpec) — one `pending/<name>/person`
  * ingest with sidecar header, data file, type marker, and manifest. */
object IngestFixtures {

  def writeGz(path: String, content: String): Unit = {
    val f = new File(path)
    f.getParentFile.mkdirs()
    val out = new GZIPOutputStream(new FileOutputStream(f))
    out.write(content.getBytes("UTF-8"))
    out.close()
  }

  def writeManifest(bucket: String, name: String): Unit = {
    val p = Paths.get(s"$bucket/pending/$name/manifest.json")
    Files.createDirectories(p.getParent)
    Files.writeString(p,
      """{"FileName": "person_headers.csv.gz", "SHA256": "aa"}
        |{"FileName": "person_sample.csv.gz", "SHA256": "bb"}""".stripMargin)
  }

  /** Build `pending/<name>/person/...` with marker + optional manifest. */
  def makeIngest(bucket: String, name: String, ingestType: String,
                 withManifest: Boolean = true): Unit = {
    writeGz(s"$bucket/pending/$name/person/person_headers.csv.gz",
      "person_id,name,age\n")
    writeGz(s"$bucket/pending/$name/person/person_sample.csv.gz",
      "1,alice,30\n2,bob,40\n3,carol,50\n")
    Files.createDirectories(Paths.get(s"$bucket/pending/$name"))
    Files.writeString(Paths.get(s"$bucket/pending/$name/$ingestType.txt"), "")
    if (withManifest) writeManifest(bucket, name)
  }
}
