package graft

import org.apache.spark.sql.functions._

import graft.model.Fixtures
import graft.operators.ListingOps

/** Mirrors the reference's helpers.spec.js listing tests
  * (/root/reference/src/helpers.spec.js:113–210,268–277). */
class ListingOpsSpec extends SparkSuite {

  test("isTimestamp accepts numeric strings, rejects others (helpers.spec.js:113–120)") {
    import spark.implicits._
    val df = Seq("1538055250", "1111", ".DS_Store", "manifest.json", "person")
      .toDF("v").select(col("v"), ListingOps.isTimestamp(col("v")).as("ok"))
    val got = df.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("1538055250") && got("1111"))
    assert(!got(".DS_Store") && !got("manifest.json") && !got("person"))
  }

  test("hasTimestampFolders true for ts_folders, false for no_ts_folders (helpers.spec.js:122–125)") {
    def has(keys: Seq[String]): Boolean =
      ListingOps.hasTimestampFolders(Fixtures.listing(spark, keys))
        .collect().head.getBoolean(0)
    assert(has(Fixtures.tsFolderKeys))
    assert(!has(Fixtures.noTsFolderKeys))
  }

  test("oldest ingest from in-order listing is (1538055240, bulk) (helpers.spec.js:127–132)") {
    val r = ListingOps.oldestPendingIngest(
      Fixtures.listing(spark, Fixtures.tsFolderKeys)).collect()
    assert(r.length == 1)
    assert(r.head.getString(0) == "1538055240")
    assert(r.head.getString(1) == "bulk")
  }

  test("oldest ingest from out-of-order listing is (1111, incremental) (helpers.spec.js:134–139)") {
    val r = ListingOps.oldestPendingIngest(
      Fixtures.listing(spark, Fixtures.outOfOrderKeys)).collect()
    assert(r.head.getString(0) == "1111")
    assert(r.head.getString(1) == "incremental")
  }

  test("no marker file yields no ingest params (helpers.spec.js:141–145)") {
    val r = ListingOps.oldestPendingIngest(
      Fixtures.listing(spark, Fixtures.badFolderKeys)).collect()
    assert(r.isEmpty)
  }

  test("ingestFiles for 1538055240 has 5 rows with manifest duplicated (helpers.spec.js:268–277)") {
    val rows = ListingOps.ingestFiles(
        Fixtures.listing(spark, Fixtures.tsFolderKeys), "1538055240")
      .collect().map(_.getString(0)).toSeq
    assert(rows.length == 5)
    assert(rows.count(_ == "pending/1538055240/manifest.json") == 2)
    assert(rows.contains("pending/1538055240"))
  }

  test("ingestFiles for 1538055250 (no manifest in listing) has 4 rows (helpers.spec.js:194–210)") {
    val rows = ListingOps.ingestFiles(
        Fixtures.listing(spark, Fixtures.tsFolderKeys), "1538055250")
      .collect().map(_.getString(0)).toSeq
    assert(rows.length == 4)
    assert(rows.count(_ == "pending/1538055250/manifest.json") == 1)
  }

  test("argmin ignores a junk (non-numeric) folder carrying a marker file") {
    // try_cast(junk) = null sorts FIRST under plain asc — a junk folder
    // must not beat the real oldest timestamp folder
    val keys = Seq(
      "pending/notatimestamp/bulk.txt",
      "pending/2222/incremental.txt",
      "pending/1111/bulk.txt")
    val r = ListingOps.oldestPendingIngest(Fixtures.listing(spark, keys))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(r.toSeq == Seq(("1111", "bulk")))
  }

  test("manifest probe: only folders with a manifest survive (ingestor.js:109–118)") {
    import spark.implicits._
    val folders = Seq("1538055240", "1538055250").toDF("folder")
    val r = ListingOps.foldersWithManifest(folders,
      Fixtures.listing(spark, Fixtures.tsFolderKeys)).collect().map(_.getString(0))
    assert(r.toSeq == Seq("1538055240"))
  }

  test("manifest reconciliation flags undeclared and missing files") {
    import spark.implicits._
    val manifest = Fixtures.manifestEntries.toDF("FileName", "SHA256")
    val r = graft.operators.ListingOps.reconcileManifest(
        Fixtures.listing(spark, Fixtures.manifestFolderKeys), manifest)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(r == Set(("extra.csv.gz", "undeclared"), ("missing.csv.gz", "missing")))
  }
}
