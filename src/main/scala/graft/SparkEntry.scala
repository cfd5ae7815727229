package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Fixtures, Tables}
import graft.operators.{KubeOps, ListingOps, Relational, TimeOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented SURVEY §2 operator is registered in `queries`; each
  * entry with a DuckDB-expressible equivalent also appears in `oracleSql`
  * (same column names, deterministic total ORDER BY in both engines).
  * Fixture-driven control-plane queries embed the same literals in both
  * the Spark side (graft.model.Fixtures) and the generated VALUES SQL.
  */
object SparkEntry {

  /** Flagship: 5-way star join with broadcast dimensions (SURVEY §2.3 J4)
    * on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.revenueByNation(spark, "/root/testdata/sf0.001")

  // --- helpers to keep fixture literals single-sourced ----------------------

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  private def listingValues(keys: Seq[String]): String =
    keys.map(k => s"(${sqlStr(k)})").mkString(", ")

  private def labeledListingValues(rows: Seq[(String, String)]): String =
    rows.map { case (l, k) => s"(${sqlStr(l)}, ${sqlStr(k)})" }.mkString(", ")

  // ==========================================================================
  // Control-plane queries (reference semantics over fixture listings)
  // ==========================================================================

  private def cpOldestIngest(s: SparkSession, dir: String): DataFrame =
    ListingOps.oldestPendingIngest(Fixtures.listing(s, Fixtures.outOfOrderKeys))

  private val cpOldestIngestSql: String =
    s"""WITH listing(key) AS (VALUES ${listingValues(Fixtures.outOfOrderKeys)}),
       |parts AS (SELECT string_split(key, '/') AS p FROM listing),
       |marked AS (SELECT p[2] AS "ingestName", p[3] AS f FROM parts
       |           WHERE p[3] IN ('bulk.txt', 'incremental.txt'))
       |SELECT "ingestName", replace(f, '.txt', '') AS "ingestType"
       |FROM marked ORDER BY CAST("ingestName" AS BIGINT) LIMIT 1""".stripMargin

  private val labeledFixtures: Seq[(String, String)] =
    Fixtures.tsFolderKeys.map(("ts_folders", _)) ++
      Fixtures.noTsFolderKeys.map(("no_ts_folders", _)) ++
      Fixtures.badFolderKeys.map(("bad_folders", _)) ++
      Fixtures.outOfOrderKeys.map(("out_of_order", _))

  private def cpHasTsFolders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val df = labeledFixtures.toDF("fixture", "key")
    df.select(col("fixture"), get(split(col("key"), "/"), lit(1)).as("folder"))
      .groupBy(col("fixture"))
      .agg(max(when(ListingOps.isTimestamp(col("folder")), true).otherwise(false))
        .as("has_ts_folders"))
      .orderBy(col("fixture"))
  }

  private val cpHasTsFoldersSql: String =
    s"""WITH listing(fixture, key) AS (VALUES ${labeledListingValues(labeledFixtures)})
       |SELECT fixture,
       |       max(CASE WHEN try_cast(string_split(key, '/')[2] AS BIGINT) >= 0
       |                THEN true ELSE false END) AS has_ts_folders
       |FROM listing GROUP BY fixture ORDER BY fixture""".stripMargin

  private def cpIngestFiles(s: SparkSession, dir: String): DataFrame = {
    val listing = Fixtures.listing(s, Fixtures.tsFolderKeys)
    ListingOps.ingestFiles(listing, "1538055240").orderBy(col("key"))
  }

  private val cpIngestFilesSql: String =
    s"""WITH listing(key) AS (VALUES ${listingValues(Fixtures.tsFolderKeys)})
       |SELECT key FROM (
       |  SELECT 'pending/1538055240/manifest.json' AS key
       |  UNION ALL SELECT 'pending/1538055240'
       |  UNION ALL SELECT key FROM listing
       |  WHERE list_contains(string_split(key, '/'), '1538055240')
       |) ORDER BY key""".stripMargin

  private def cpJobLabels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val jobs = KubeOps.parseJobs(Seq(Fixtures.jobsJson).toDF("json"))
    val bulk = KubeOps.jobLabels(jobs, "bulk").withColumn("job_type", lit("bulk"))
    val delta = KubeOps.jobLabels(jobs, "incremental").withColumn("job_type", lit("delta"))
    bulk.unionByName(delta).select(col("job_type"), col("name"))
      .orderBy(col("job_type"), col("name"))
  }

  private val cpJobLabelsSql: String = {
    val names = Seq(
      Some("elastic-bulk-1538055000"), Some("neo4j-bulk-1538055000"),
      Some("elastic-delta-1537362006"), Some("elastic-delta-1537362006"),
      Some("some-other-important-job"), None)
    val values = names.map {
      case Some(n) => s"(${sqlStr(n)})"
      case None    => "(CAST(NULL AS VARCHAR))"
    }.mkString(", ")
    s"""WITH jobs(name) AS (VALUES $values),
       |relevant AS (
       |  SELECT name FROM jobs
       |  WHERE len(list_intersect(string_split(coalesce(name, ''), '-'),
       |                           ['neo4j', 'elastic'])) > 0)
       |SELECT job_type, name FROM (
       |  SELECT 'bulk' AS job_type, name FROM relevant WHERE name LIKE '%-bulk-%'
       |  UNION ALL
       |  SELECT 'delta' AS job_type, name FROM relevant WHERE name LIKE '%-delta-%'
       |) ORDER BY job_type, name""".stripMargin
  }

  private def cpJobStatus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val jobs = KubeOps.parseJobs(Seq(Fixtures.jobsJson).toDF("json"))
    jobs.select(
        coalesce(col("name"), lit("")).as("name"),
        KubeOps.jobSucceeded(col("succeeded")).as("done"))
      .orderBy(col("name"), col("done"))
  }

  private val cpJobStatusSql: String =
    """SELECT name, done FROM (VALUES
      |  ('', false),
      |  ('elastic-bulk-1538055000', true),
      |  ('elastic-delta-1537362006', false),
      |  ('elastic-delta-1537362006', false),
      |  ('neo4j-bulk-1538055000', true),
      |  ('some-other-important-job', true)
      |) t(name, done) ORDER BY name, done""".stripMargin

  private def cpPodStatus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val raw = Fixtures.podJsons.toDF("pod", "json")
    val parsed = raw.select(col("pod"), from_json(col("json"), KubeOps.podSchema).as("doc"))
    parsed.select(
        col("pod"),
        KubeOps.podReady(col("doc")).as("ready"),
        unix_timestamp(KubeOps.podStartedAt(col("doc"))).as("started_epoch"),
        KubeOps.podFresh(KubeOps.podStartedAt(col("doc")),
          lit("2018-10-10 10:05:00").cast("timestamp")).as("fresh"))
      .orderBy(col("pod"))
  }

  /** Golden values pinned by helpers.spec.js:41–110,303–328:
    * 2018-10-10T10:10:00Z = 1539166200, 2018-10-09T10:10:00Z = 1539079800. */
  private val cpPodStatusSql: String =
    """SELECT pod, ready, started_epoch, fresh FROM (VALUES
      |  ('pod_no_build', false, CAST(NULL AS BIGINT), false),
      |  ('pod_not_ready', false, 1539166200, true),
      |  ('pod_ready', true, 1539166200, true),
      |  ('pod_stale', true, 1539079800, false),
      |  ('pod_terminated', false, CAST(NULL AS BIGINT), false)
      |) t(pod, ready, started_epoch, fresh) ORDER BY pod""".stripMargin

  private def cpDurations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val df = Fixtures.durations.toDF("label", "start_epoch", "end_epoch")
    df.select(
        col("label"),
        TimeOps.jobDuration(col("start_epoch"), col("end_epoch")).as("duration"))
      .orderBy(col("label"))
  }

  private val cpDurationsSql: String = {
    val values = Fixtures.durations.map { case (l, st, en) =>
      s"(${sqlStr(l)}, $st, ${en.map(_.toString).getOrElse("CAST(NULL AS BIGINT)")})"
    }.mkString(", ")
    s"""WITH d(label, start_epoch, end_epoch) AS (VALUES $values)
       |SELECT label,
       |       CASE WHEN end_epoch IS NULL THEN 'timestamp error'
       |            ELSE printf('%dh:%02dmins',
       |                        ((end_epoch - start_epoch) // 3600) % 24,
       |                        ((end_epoch - start_epoch) // 60) % 60)
       |       END AS duration
       |FROM d ORDER BY label""".stripMargin
  }

  private def cpManifestReconcile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val folderFiles = Fixtures.listing(s, Fixtures.manifestFolderKeys)
    val manifest = Fixtures.manifestEntries.toDF("FileName", "SHA256")
    ListingOps.reconcileManifest(folderFiles, manifest)
      .orderBy(col("which"), col("FileName"))
  }

  private val cpManifestReconcileSql: String = {
    val manifestValues = Fixtures.manifestEntries
      .map { case (f, h) => s"(${sqlStr(f)}, ${sqlStr(h)})" }.mkString(", ")
    s"""WITH listing(key) AS (VALUES ${listingValues(Fixtures.manifestFolderKeys)}),
       |manifest("FileName", sha) AS (VALUES $manifestValues),
       |files AS (
       |  SELECT list_extract(string_split(key, '/'), len(string_split(key, '/'))) AS "FileName"
       |  FROM listing
       |  WHERE list_extract(string_split(key, '/'), len(string_split(key, '/')))
       |        NOT IN ('manifest.json', 'bulk.txt', 'incremental.txt'))
       |SELECT "FileName", which FROM (
       |  SELECT "FileName", 'undeclared' AS which FROM files
       |  WHERE "FileName" NOT IN (SELECT "FileName" FROM manifest)
       |  UNION ALL
       |  SELECT "FileName", 'missing' AS which FROM manifest
       |  WHERE "FileName" NOT IN (SELECT "FileName" FROM files)
       |) ORDER BY which, "FileName"""".stripMargin
  }

  // ==========================================================================
  // Relational core [EXT] oracle SQL
  // ==========================================================================

  private val q1PricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
      |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  private val q5RevenueByNationSql: String =
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  private val q3TopRevenueOrdersSql: String =
    """SELECT o_orderkey, o_orderdate,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin

  private val qBrandSql: String =
    """SELECT p_brand,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
      |  count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  private val qSemiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
      |ORDER BY c_custkey""".stripMargin

  private val qAntiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
      |ORDER BY c_custkey""".stripMargin

  private val qRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  private val qCubeSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  count(*) AS n
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  private val qTopPerSegmentSql: String =
    """SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY c_mktsegment
      |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |) WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin

  private val qRunningSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_total
      |FROM orders WHERE o_custkey <= 50
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  private val qGapsSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  datediff('day',
      |    CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
      |                                ORDER BY o_orderdate, o_orderkey) AS DATE),
      |    CAST(o_orderdate AS DATE)) AS gap_days
      |FROM orders WHERE o_custkey <= 50
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  private val qMinBySql: String =
    """SELECT o_custkey, o_orderkey AS first_orderkey,
      |       CAST(o_orderdate AS DATE) AS first_orderdate
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders
      |) WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  private val qSetOpsSql: String =
    """SELECT c_custkey, op FROM (
      |  SELECT c_custkey, 'except' AS op FROM (
      |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |    EXCEPT
      |    SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
      |  UNION ALL
      |  SELECT c_custkey, 'intersect' AS op FROM (
      |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |    INTERSECT
      |    SELECT c_custkey FROM customer WHERE c_acctbal > 0)
      |) ORDER BY op, c_custkey""".stripMargin

  private val qPercentilesSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ==========================================================================
  // Registry
  // ==========================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // control plane (reference semantics)
    "cp_oldest_ingest" -> (cpOldestIngest _),
    "cp_has_ts_folders" -> (cpHasTsFolders _),
    "cp_ingest_files" -> (cpIngestFiles _),
    "cp_job_labels" -> (cpJobLabels _),
    "cp_job_status" -> (cpJobStatus _),
    "cp_pod_status" -> (cpPodStatus _),
    "cp_durations" -> (cpDurations _),
    "cp_manifest_reconcile" -> (cpManifestReconcile _),
    // relational core [EXT]
    "q1_pricing_summary" -> ((s, d) => Relational.pricingSummary(s, d)),
    "q5_revenue_by_nation" -> ((s, d) => Relational.revenueByNation(s, d)),
    "q3_top_revenue_orders" -> ((s, d) => Relational.topRevenueOrders(s, d)),
    "q_revenue_by_brand" -> ((s, d) => Relational.revenueByBrand(s, d)),
    "q_semi_join" -> ((s, d) => Relational.customersWithBigOrders(s, d)),
    "q_anti_join" -> ((s, d) => Relational.customersWithoutOrders(s, d)),
    "q_rollup" -> ((s, d) => Relational.rollupSummary(s, d)),
    "q_cube" -> ((s, d) => Relational.cubeSummary(s, d)),
    "q_topk_per_group" -> ((s, d) => Relational.topOrdersPerSegment(s, d)),
    "q_window_running" -> ((s, d) => Relational.runningRevenuePerCustomer(s, d)),
    "q_window_lag" -> ((s, d) => Relational.orderGaps(s, d)),
    "q_min_by" -> ((s, d) => Relational.oldestOrderPerCustomer(s, d)),
    "q_set_ops" -> ((s, d) => Relational.segmentSetOps(s, d)),
    "q_percentiles" -> ((s, d) => Relational.exactPercentiles(s, d)),
    "q_sketches" -> ((s, d) => Relational.sketchSummary(s, d))
  )

  def oracleSql: Map[String, String] = Map(
    "cp_oldest_ingest" -> cpOldestIngestSql,
    "cp_has_ts_folders" -> cpHasTsFoldersSql,
    "cp_ingest_files" -> cpIngestFilesSql,
    "cp_job_labels" -> cpJobLabelsSql,
    "cp_job_status" -> cpJobStatusSql,
    "cp_pod_status" -> cpPodStatusSql,
    "cp_durations" -> cpDurationsSql,
    "cp_manifest_reconcile" -> cpManifestReconcileSql,
    "q1_pricing_summary" -> q1PricingSummarySql,
    "q5_revenue_by_nation" -> q5RevenueByNationSql,
    "q3_top_revenue_orders" -> q3TopRevenueOrdersSql,
    "q_revenue_by_brand" -> qBrandSql,
    "q_semi_join" -> qSemiSql,
    "q_anti_join" -> qAntiSql,
    "q_rollup" -> qRollupSql,
    "q_cube" -> qCubeSql,
    "q_topk_per_group" -> qTopPerSegmentSql,
    "q_window_running" -> qRunningSql,
    "q_window_lag" -> qGapsSql,
    "q_min_by" -> qMinBySql,
    "q_set_ops" -> qSetOpsSql,
    "q_percentiles" -> qPercentilesSql
    // q_sketches: intentionally no oracle — sketch internals are
    // engine-specific; driver records a rows-only check.
  )
}
