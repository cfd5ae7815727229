package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** In-memory fixtures transliterated from the reference's Jest mocks
  * (see /root/repo/FIXTURES.md §A). These pin the control-plane operator
  * semantics; the same literals appear in the DuckDB oracle SQL as VALUES
  * so the fixture-driven queries are end-to-end checkable.
  */
object Fixtures {

  /** reference src/__mocks__/s3-client.js:3–57 — `ts_folders` listing. */
  val tsFolderKeys: Seq[String] = Seq(
    "pending/.DS_Store",
    "pending/manifest.json",
    "pending/1538055240/person/person_headers.csv.gz",
    "pending/1538055240/bulk.txt",
    "pending/1538055240/manifest.json",
    "pending/1538055250/person/person_headers.csv.gz",
    "pending/1538055250/person/person_sample.csv.gz"
  )

  /** reference src/__mocks__/s3-client.js:68–92 — `out_of_order_folders`;
    * helpers.spec.js:134–139 pins oldest = ("1111","incremental"). */
  val outOfOrderKeys: Seq[String] = Seq(
    "pending/2222",
    "pending/2222/bulk.txt",
    "pending/2222/manifest.json",
    "pending/1111",
    "pending/1111/incremental.txt",
    "pending/3333",
    "pending/3333/incremental.txt"
  )

  /** reference src/__mocks__/s3-client.js — `no_ts_folders`. */
  val noTsFolderKeys: Seq[String] = Seq(
    "pending/.DS_Store",
    "pending/manifest.json"
  )

  /** helpers.spec.js:141–145 — folders without a marker file. */
  val badFolderKeys: Seq[String] = Seq(
    "pending/.DS_Store",
    "pending/1538055240/person/person_headers.csv.gz"
  )

  /** kubectl `get jobs` names (src/__mocks__/child_process.js:14–42);
    * `some-other-important-job` must be filtered out. A null name row
    * exercises the `R.pathOr('', ...)` default (helpers.js:53). */
  val jobNames: Seq[Option[String]] = Seq(
    Some("elastic-bulk-1538055000"),
    Some("neo4j-bulk-1538055000"),
    Some("elastic-delta-1537362006"),
    Some("elastic-delta-1537362006"),
    Some("some-other-important-job"),
    None
  )

  /** Golden duration fixtures (ingestor.spec.js:355–358 +
    * helpers.spec.js:212–221): (label, start-epoch-sec, end-epoch-sec|null).
    * 2h:15mins = 8100s, 1h:05mins = 3900s, 2h:29mins = 8940s; a >24h case
    * pins the `% 24` day truncation; null end ⇒ 'timestamp error'. */
  val durations: Seq[(String, Long, Option[Long])] = Seq(
    ("neo_bulk", 1538050000L, Some(1538050000L + 8100)),
    ("elastic_bulk", 1538050000L, Some(1538050000L + 3900)),
    ("total_bulk", 1538050000L, Some(1538050000L + 8940)),
    ("day_trunc", 1538050000L, Some(1538050000L + 26 * 3600 + 300)),
    ("zero", 1538050000L, Some(1538050000L)),
    ("error_case", 1538050000L, None)
  )

  /** kubectl `get jobs -o json` document (src/__mocks__/child_process.js:
    * 14–42): the four entitysearch jobs + one irrelevant job; bulk jobs are
    * complete (succeeded=1, Complete condition), delta jobs still active.
    * The no-metadata item exercises the pathOr('') default (helpers.js:53). */
  val jobsJson: String =
    """{"items": [
      |  {"metadata": {"name": "elastic-bulk-1538055000"},
      |   "status": {"succeeded": 1, "conditions": [{"type": "Complete", "status": "True"}]}},
      |  {"metadata": {"name": "neo4j-bulk-1538055000"},
      |   "status": {"succeeded": 1, "conditions": [{"type": "Complete", "status": "True"}]}},
      |  {"metadata": {"name": "elastic-delta-1537362006"},
      |   "status": {"active": 1}},
      |  {"metadata": {"name": "elastic-delta-1537362006"},
      |   "status": {"active": 1}},
      |  {"metadata": {"name": "some-other-important-job"},
      |   "status": {"succeeded": 1}},
      |  {"status": {"active": 1}}
      |]}""".stripMargin

  /** kubectl pod documents (helpers.spec.js:41–110,303–328): (label, json).
    * Only the container named `build` counts (helpers.js:78,85); the
    * terminated variant has no running.startedAt path. */
  val podJsons: Seq[(String, String)] = Seq(
    ("pod_ready" ->
      """{"status": {"containerStatuses": [
        |  {"name": "install", "ready": true, "restartCount": 0,
        |   "state": {"running": {"startedAt": "2018-10-10T09:00:00Z"}}},
        |  {"name": "build", "ready": true, "restartCount": 0,
        |   "state": {"running": {"startedAt": "2018-10-10T10:10:00Z"}}}
        |]}}""".stripMargin),
    ("pod_stale" ->
      """{"status": {"containerStatuses": [
        |  {"name": "build", "ready": true, "restartCount": 0,
        |   "state": {"running": {"startedAt": "2018-10-09T10:10:00Z"}}}
        |]}}""".stripMargin),
    ("pod_not_ready" ->
      """{"status": {"containerStatuses": [
        |  {"name": "build", "ready": false, "restartCount": 1,
        |   "state": {"running": {"startedAt": "2018-10-10T10:10:00Z"}}}
        |]}}""".stripMargin),
    ("pod_terminated" ->
      """{"status": {"containerStatuses": [
        |  {"name": "build", "ready": false, "restartCount": 0,
        |   "state": {"terminated": {"containerID": "docker://c0ffee"}}}
        |]}}""".stripMargin),
    ("pod_no_build" ->
      """{"status": {"containerStatuses": [
        |  {"name": "sidecar", "ready": true, "restartCount": 0,
        |   "state": {"running": {"startedAt": "2018-10-10T10:10:00Z"}}}
        |]}}""".stripMargin)
  ).map(identity)

  /** Manifest fixture (README.md:17–33) + a folder listing that disagrees
    * with it: `extra.csv.gz` is present-but-undeclared, `missing.csv.gz`
    * declared-but-absent. */
  val manifestEntries: Seq[(String, String)] = Seq(
    ("person_headers.csv.gz", "f1d2d2f924e986ac86fdf7b36c94bcdf32beec15"),
    ("person_sample.csv.gz", "ba6119931c7010138e3ca0a1ce34d1e3a5f88c46"),
    ("missing.csv.gz", "e242ed3bffccdf271b7fbaf34ed72d089537b42f")
  )

  val manifestFolderKeys: Seq[String] = Seq(
    "pending/1538055240/person/person_headers.csv.gz",
    "pending/1538055240/person/person_sample.csv.gz",
    "pending/1538055240/person/extra.csv.gz",
    "pending/1538055240/bulk.txt",
    "pending/1538055240/manifest.json"
  )

  def listing(spark: SparkSession, keys: Seq[String]): DataFrame = {
    import spark.implicits._
    keys.toDF("key")
  }

  /** [[jobsJson]] as structured items — the single-sourced input the
    * parameterized CpFaces builders (and their fuzz twin) consume;
    * CpFaces.jobsJson(jobItems) renders the same document shape. */
  val jobItems: Seq[graft.CpFaces.JobItem] = Seq(
    graft.CpFaces.JobItem(Some("elastic-bulk-1538055000"), Some(1L), None, complete = true),
    graft.CpFaces.JobItem(Some("neo4j-bulk-1538055000"), Some(1L), None, complete = true),
    graft.CpFaces.JobItem(Some("elastic-delta-1537362006"), None, Some(1L), complete = false),
    graft.CpFaces.JobItem(Some("elastic-delta-1537362006"), None, Some(1L), complete = false),
    graft.CpFaces.JobItem(Some("some-other-important-job"), Some(1L), None, complete = false),
    graft.CpFaces.JobItem(None, None, Some(1L), complete = false))

  /** [[podJsons]] as structured docs (epochs: 2018-10-10T10:10:00Z =
    * 1539166200, 09:00Z = 1539162000, 2018-10-09T10:10:00Z =
    * 1539079800); job start 2018-10-10T10:05:00Z = 1539165900. */
  val podStartEpoch: Long = 1539165900L
  val podDocs: Seq[graft.CpFaces.PodDoc] = Seq(
    graft.CpFaces.PodDoc("pod_ready", Seq(
      graft.CpFaces.Container("install", ready = true, 0, Some(1539162000L), terminated = false),
      graft.CpFaces.Container("build", ready = true, 0, Some(1539166200L), terminated = false))),
    graft.CpFaces.PodDoc("pod_stale", Seq(
      graft.CpFaces.Container("build", ready = true, 0, Some(1539079800L), terminated = false))),
    graft.CpFaces.PodDoc("pod_not_ready", Seq(
      graft.CpFaces.Container("build", ready = false, 1, Some(1539166200L), terminated = false))),
    graft.CpFaces.PodDoc("pod_terminated", Seq(
      graft.CpFaces.Container("build", ready = false, 0, None, terminated = true))),
    graft.CpFaces.PodDoc("pod_no_build", Seq(
      graft.CpFaces.Container("sidecar", ready = true, 0, Some(1539166200L), terminated = false))))

  /** cp_times_agg golden events (ingestor.spec.js:355–358 shape). */
  val timesEvents: Seq[graft.CpFaces.TimesEvent] = {
    val t0 = 1538050000L
    Seq(
      graft.CpFaces.TimesEvent("A", "neo4j", "start", t0),
      graft.CpFaces.TimesEvent("A", "neo4j", "end", t0 + 8100),
      graft.CpFaces.TimesEvent("A", "elastic", "start", t0 + 5040),
      graft.CpFaces.TimesEvent("A", "elastic", "end", t0 + 8940),
      graft.CpFaces.TimesEvent("B", "neo4j", "start", t0),
      graft.CpFaces.TimesEvent("B", "neo4j", "end", t0 + 600),
      graft.CpFaces.TimesEvent("B", "elastic", "start", t0 + 600))
  }
}
