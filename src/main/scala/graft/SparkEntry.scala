package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{DedupOps, MultimodalOps, SampleOps, SimilarityOps, TextOps}
import graft.model.{Fixtures, Tables}
import graft.operators.{ChangeOps, EventOps, KubeOps, ListingOps, Relational, TimeOps}

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

  private def sqlStr(s: String): String = CpFaces.sqlStr(s)

  // ==========================================================================
  // Control-plane queries (reference semantics over fixture listings) —
  // face + oracle pairs live in CpFaces, parameterized so graft.FuzzCp
  // can drive the SAME chains with randomized inputs; here they are
  // instantiated with the reference-transliterated Fixtures constants.
  // ==========================================================================

  private def cpOldestIngest(s: SparkSession, dir: String): DataFrame =
    CpFaces.oldestIngest(Fixtures.outOfOrderKeys)(s)

  private val cpOldestIngestSql: String =
    CpFaces.oldestIngestSql(Fixtures.outOfOrderKeys)

  private val labeledFixtures: Seq[(String, String)] =
    Fixtures.tsFolderKeys.map(("ts_folders", _)) ++
      Fixtures.noTsFolderKeys.map(("no_ts_folders", _)) ++
      Fixtures.badFolderKeys.map(("bad_folders", _)) ++
      Fixtures.outOfOrderKeys.map(("out_of_order", _))

  private def cpHasTsFolders(s: SparkSession, dir: String): DataFrame =
    CpFaces.hasTsFolders(labeledFixtures)(s)

  private val cpHasTsFoldersSql: String =
    CpFaces.hasTsFoldersSql(labeledFixtures)

  private def cpIngestFiles(s: SparkSession, dir: String): DataFrame =
    CpFaces.ingestFiles(Fixtures.tsFolderKeys, "1538055240")(s)

  private val cpIngestFilesSql: String =
    CpFaces.ingestFilesSql(Fixtures.tsFolderKeys, "1538055240")

  private def cpJobLabels(s: SparkSession, dir: String): DataFrame =
    CpFaces.jobLabels(Fixtures.jobItems)(s)

  private val cpJobLabelsSql: String =
    CpFaces.jobLabelsSql(Fixtures.jobItems)

  private def cpJobStatus(s: SparkSession, dir: String): DataFrame =
    CpFaces.jobStatus(Fixtures.jobItems)(s)

  private val cpJobStatusSql: String =
    CpFaces.jobStatusSql(Fixtures.jobItems)

  private def cpPodStatus(s: SparkSession, dir: String): DataFrame =
    CpFaces.podStatus(Fixtures.podDocs, Fixtures.podStartEpoch)(s)

  private val cpPodStatusSql: String =
    CpFaces.podStatusSql(Fixtures.podDocs, Fixtures.podStartEpoch)

  private def cpDurations(s: SparkSession, dir: String): DataFrame =
    CpFaces.durations(Fixtures.durations)(s)

  private val cpDurationsSql: String =
    CpFaces.durationsSql(Fixtures.durations)

  private def cpManifestReconcile(s: SparkSession, dir: String): DataFrame =
    CpFaces.manifestReconcile(Fixtures.manifestFolderKeys,
      Fixtures.manifestEntries)(s)

  private val cpManifestReconcileSql: String =
    CpFaces.manifestReconcileSql(Fixtures.manifestFolderKeys,
      Fixtures.manifestEntries)

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

  // Q7 shape: two-nation shipping volume by ship year
  private val qVolumeShippingSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  // per-join-key skew planning table over lineitem — all exact integers
  private val qSkewReportSql: String =
    Seq("l_orderkey", "l_partkey", "l_suppkey").map { k =>
      s"""SELECT '$k' AS key_col,
         |  CAST(count(*) AS BIGINT) AS n_keys,
         |  CAST(sum(cnt) AS BIGINT) AS n_rows,
         |  CAST(max(cnt) AS BIGINT) AS max_cnt,
         |  (CAST(max(cnt) AS BIGINT) * 1000000) // CAST(sum(cnt) AS BIGINT)
         |    AS max_share_micro,
         |  (CAST(max(cnt) AS BIGINT) * 1000000)
         |    // (CAST(sum(cnt) AS BIGINT) // CAST(count(*) AS BIGINT))
         |    AS skew_factor_micro
         |FROM (SELECT CAST(count(*) AS BIGINT) AS cnt
         |      FROM lineitem GROUP BY $k) t""".stripMargin
    }.mkString("\n  UNION ALL ") + "\nORDER BY key_col"

  // Q8 shape: NATION_1's share of revenue delivered to ASIA customers,
  // per order year — exact integer micro units end to end
  private val qMarketShareSql: String =
    """SELECT o_year, nation_units, total_units,
      |  (nation_units * 1000000) // total_units AS mkt_share_micro
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    CAST(sum(CASE WHEN sn.n_name = 'NATION_1'
      |      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
      |      ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT) AS nation_units,
      |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS total_units
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  WHERE c_nationkey IN (SELECT n_nationkey FROM nation
      |    JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
      |  GROUP BY 1) t
      |ORDER BY o_year""".stripMargin

  private val q3TopRevenueOrdersSql: String =
    """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
      |GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
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
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
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
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_total
      |FROM orders WHERE o_custkey <= 50
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  private val qGapsSql: String =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
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

  private val qOuterLeftSql: String =
    """SELECT c_custkey,
      |  coalesce(cnt, 0) AS n_orders,
      |  coalesce(tot, 0.0) AS total_spent
      |FROM customer
      |LEFT JOIN (SELECT o_custkey, count(*) AS cnt,
      |             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
      |           FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey
      |ORDER BY c_custkey""".stripMargin

  private val qOuterFullSql: String =
    """SELECT coalesce(c.k, s.k) AS nationkey,
      |       c.cust_bal, c.n_cust, s.supp_bal, s.n_supp
      |FROM (SELECT c_nationkey AS k,
      |        CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS cust_bal,
      |        count(*) AS n_cust
      |      FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey) c
      |FULL OUTER JOIN
      |     (SELECT s_nationkey AS k,
      |        CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS supp_bal,
      |        count(*) AS n_supp
      |      FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey) s
      |  ON c.k = s.k
      |ORDER BY nationkey""".stripMargin

  private val qPivotSql: String =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS f_total,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS o_total,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p_total
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  private val qNtileSql: String =
    """SELECT c_custkey, c_acctbal,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM customer
      |WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
      |ORDER BY c_custkey""".stripMargin

  private val qCorrScalarSql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       l_extendedprice
      |FROM lineitem a
      |WHERE l_extendedprice = (SELECT max(b.l_extendedprice) FROM lineitem b
      |                         WHERE b.l_orderkey = a.l_orderkey)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  private val qQuarterlySql: String =
    """SELECT CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS quarter,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_orders
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  private val qStringFuncsSql: String =
    """SELECT upper(split_part(p_type, ' ', 1)) AS type_head,
      |  count(*) AS n_parts,
      |  CAST(sum(CAST(length(p_name) AS DECIMAL(18,0))) AS DOUBLE) / count(*) AS avg_name_len,
      |  min(p_name) AS first_name,
      |  max(p_name) AS last_name
      |FROM part GROUP BY 1 ORDER BY 1""".stripMargin

  // array serialized to CSV in BOTH engines: pandas cannot sort/hash
  // array-typed result columns, so the comparable form is a string
  private val qArrayAggSql: String =
    """SELECT o_custkey, array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys
      |FROM orders WHERE o_custkey <= 100
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Skew-join face: salted orders⋈customer rolled up per segment —
    * must equal the direct join (what the oracle computes). */
  private def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val joined = graft.operators.SkewOps.saltedJoin(
      Tables.orders(s, dir), Tables.customer(s, dir),
      "o_custkey", "c_custkey")
    joined.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        Relational.dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("c_mktsegment"))
  }

  private val qSaltedJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** T9 via Spark's native session_window operator. Boundary: an event
    * at exactly the gap starts a new session (>= in the oracle; the
    * lag-based ev_sessionize uses strict >). */
  private val evSessionWindowSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
      |           FROM events),
      |g AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
      |                       OR us - lag(us) OVER w >= 300000000
      |                     THEN 1 ELSE 0 END AS ns
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
      |      FROM g)
      |SELECT user_id, min(us) // 1000000 AS session_start,
      |  (max(us) + 300000000) // 1000000 AS session_end_excl,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, seq ORDER BY user_id, session_start""".stripMargin

  /** A8/skew: salted two-phase aggregate — result must equal a direct
    * GROUP BY (that equality is what the oracle checks). */
  private def qSaltedAgg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    graft.operators.SkewOps.saltedAgg(
        Tables.lineitem(s, dir),
        col("l_returnflag"),
        col("l_quantity").cast(DecimalType(18, 2)))
      .select(col("k").as("l_returnflag"), col("n").cast("long").as("n"),
        col("total").cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  private val qSaltedAggSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** F10: hashing surface — sha2/md5 over the manifest fixture names
    * (the integrity-check primitive for J3 verification). */
  private def cpHashes(s: SparkSession, dir: String): DataFrame =
    CpFaces.hashes(Fixtures.manifestEntries.map(_._1))(s)

  private val cpHashesSql: String =
    CpFaces.hashesSql(Fixtures.manifestEntries.map(_._1))

  /** F5: the metrics doc's readable-date format (ingestor.js:332,
    * 'ddd MMM YYYY HH:mm' → 'EEE MMM yyyy HH:mm'; English day/month
    * abbreviations in both engines). */
  private def cpReadableDate(s: SparkSession, dir: String): DataFrame =
    CpFaces.readableDate(Fixtures.durations)(s)

  private val cpReadableDateSql: String =
    CpFaces.readableDateSql(Fixtures.durations)

  /** §2.10 UDAF surface in the gate: the typed Times Aggregator rolled
    * up per ingest over the golden fixture (ingestor.spec.js:355–358);
    * mergeable buffer ⇒ the plan is a real partial+final aggregate. */
  private def cpTimesAgg(s: SparkSession, dir: String): DataFrame =
    CpFaces.timesAgg(Fixtures.timesEvents)(s)

  private val cpTimesAggSql: String =
    CpFaces.timesAggSql(Fixtures.timesEvents)

  /** A6/F-surface: exact distinct users + value totals per event type. */
  private def evUserStats(s: SparkSession, dir: String): DataFrame =
    EventOps.events(s, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        Relational.dsum(col("value")).as("sum_value"))
      .orderBy(col("event_type"))

  private val evUserStatsSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ==========================================================================
  // LLM-data ops [EXT] oracle SQL (text / dedup / similarity / multimodal)
  // ==========================================================================

  private val stopSet = TextOps.stopwords.map(sqlStr).mkString("(", ", ", ")")

  private val textStatsSql: String =
    s"""WITH t AS (SELECT doc_id, length(text) AS nc,
       |                  string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents)
       |SELECT doc_id, CAST(nc AS BIGINT) AS n_chars_actual,
       |  CAST(len(toks) AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
       |  CAST(nc AS DOUBLE) / len(toks) AS chars_per_token,
       |  CAST(len(list_filter(toks, x -> x IN $stopSet)) AS DOUBLE) / len(toks)
       |    AS stopword_ratio
       |FROM t ORDER BY doc_id""".stripMargin

  private val textQualitySql: String =
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents),
       |x AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS nt,
       |        CAST(len(list_distinct(toks)) AS DOUBLE) AS nd,
       |        CAST(len(list_filter(toks, y -> y IN $stopSet)) AS DOUBLE) AS ns
       |      FROM t)
       |SELECT doc_id,
       |  round(least(nt / 100.0, 1.0) * 0.4 + (nd / nt) * 0.4 + (ns / nt) * 0.2, 6) AS quality,
       |  (round(least(nt / 100.0, 1.0) * 0.4 + (nd / nt) * 0.4 + (ns / nt) * 0.2, 6) >= 0.3) AS keep
       |FROM x ORDER BY doc_id""".stripMargin

  /** Replay of TextOps.pretrainCorpus: the LR training chain + the
    * span chain + the per-source rollup in ONE statement — the whole
    * learned curation pipeline hash-checks end to end. */
  private val textPretrainCorpusSql: String = {
    val wf = s"w${TextOps.lrRounds}t"
    val zExpr = lrZExprSql("w")
    s"""WITH $lrChainCtes,
       |$spanChainCtes,
       |predt AS (SELECT doc_id,
       |    greatest(0.0, least(1.0, 0.5 + $zExpr / 4.0)) >= 0.5 AS pred
       |  FROM f CROSS JOIN $wf w),
       |fracs AS (SELECT c.doc_id,
       |    CASE WHEN c.canon_chars > 0
       |      THEN CAST(coalesce(p.covered_chars, 0) AS DOUBLE) /
       |           CAST(c.canon_chars AS DOUBLE)
       |      ELSE 0.0 END AS dup_frac
       |  FROM canon c LEFT JOIN perdoc p USING (doc_id)),
       |dt AS (SELECT doc_id, source,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
       |      AS n_tokens
       |  FROM documents),
       |j AS (SELECT d.source, d.n_tokens,
       |    (predt.pred AND fracs.dup_frac < ${TextOps.pretrainDupFracMax})
       |      AS kept
       |  FROM dt d JOIN predt USING (doc_id) JOIN fracs USING (doc_id)),
       |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |    CAST(sum(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT)
       |      AS kept_tokens,
       |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens
       |  FROM j GROUP BY source)
       |SELECT source, n_docs, n_kept, kept_tokens, total_tokens,
       |  CAST(kept_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)
       |    AS kept_frac
       |FROM agg ORDER BY source""".stripMargin
  }

  /** Replay of TextOps.collocations: same adjacent bigrams off the
    * token list, same count floor, same fixed-point PMI (positive
    * operands, so DuckDB's floor `//` ≡ Spark's truncating DIV). */
  /** Replay of TextOps.dsirScores: md5-prefix hashed-feature buckets,
    * smoothed target/raw probability ratios in exact micro integers,
    * per-doc integer-mean score, percentile-threshold selection (the
    * q_percentiles round-to-4 contract). DuckDB's integer sums widen
    * to HUGEINT so its intermediate arithmetic can never overflow; the
    * Spark side's Long bound is documented at the operator. */
  private lazy val textDsirChainCtes: String = {
    val t = TextOps.dsirTargetSource
    val b = TextOps.dsirBuckets
    val q = TextOps.dsirKeepQuantile
    s"""toks AS (
       |  SELECT doc_id, source, t AS token FROM (
       |    SELECT doc_id, source,
       |           unnest(string_split_regex(trim(text), '\\s+')) AS t
       |    FROM documents) z
       |  WHERE len(t) > 0),
       |tb AS (SELECT doc_id, source, substring(md5(token), 1, 2) AS b
       |       FROM toks),
       |counts AS (SELECT b,
       |    sum(CASE WHEN source = '$t' THEN 1 ELSE 0 END) AS cnt_t,
       |    sum(CASE WHEN source <> '$t' THEN 1 ELSE 0 END) AS cnt_r
       |  FROM tb GROUP BY b),
       |tot AS (SELECT sum(cnt_t) AS tot_t, sum(cnt_r) AS tot_r FROM counts),
       |ratios AS (SELECT b,
       |    ((cnt_t + 1) * (tot_r + $b) * 1000000)
       |      // ((cnt_r + 1) * (tot_t + $b)) AS ratio_micro
       |  FROM counts, tot),
       |perdoc AS (SELECT doc_id, count(*) AS n_tokens,
       |    sum(ratio_micro) AS w_sum
       |  FROM tb JOIN ratios USING (b) GROUP BY doc_id),
       |dscored AS (SELECT doc_id, n_tokens,
       |    w_sum // n_tokens AS score_micro FROM perdoc),
       |thr AS (SELECT round(quantile_cont(score_micro, $q), 4) AS thr
       |        FROM dscored),
       |dsel AS (SELECT d.doc_id, d.source,
       |    CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
       |    CAST(coalesce(s.score_micro, 0) AS BIGINT) AS score_micro,
       |    (coalesce(s.n_tokens, 0) > 0 AND
       |     coalesce(CAST(s.score_micro AS DOUBLE) >= thr.thr, false)) AS selected
       |  FROM documents d LEFT JOIN dscored s USING (doc_id), thr)""".stripMargin
  }

  private lazy val textDsirSql: String =
    s"""WITH $textDsirChainCtes
       |SELECT doc_id, source, n_tokens, score_micro, selected
       |FROM dsel ORDER BY doc_id""".stripMargin

  private lazy val textDsirMixSql: String =
    s"""WITH $textDsirChainCtes
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN selected THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       |  CAST(sum(CASE WHEN selected THEN n_tokens ELSE 0 END) AS BIGINT)
       |    AS selected_tokens,
       |  (CAST(sum(CASE WHEN selected THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
       |    // count(*) AS selected_frac_micro
       |FROM dsel GROUP BY source ORDER BY source""".stripMargin

  /** Replay of SampleOps.dsirResample: the DSIR score chain composed
    * with the samp_pps systematic-PPS draw (exact integer prefix sums
    * + DIV target counting) — the importance-RESAMPLING estimator
    * hash-checks end to end. */
  private lazy val sampDsirSql: String = {
    val n = graft.ext.SampleOps.dsirSampleN
    s"""WITH $textDsirChainCtes,
       |line AS MATERIALIZED (
       |  SELECT doc_id, source, score_micro,
       |    CAST(sum(score_micro) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(sum(score_micro) OVER () AS BIGINT) AS w_total
       |  FROM dsel)
       |SELECT doc_id, source, score_micro, cum,
       |  ($n * cum) // w_total - ($n * (cum - score_micro)) // w_total AS hits
       |FROM line
       |WHERE ($n * cum) // w_total - ($n * (cum - score_micro)) // w_total > 0
       |ORDER BY doc_id""".stripMargin
  }

  private val textCollocationsSql: String = {
    val floor = TextOps.collocMinCount
    val k = TextOps.collocTopK
    s"""WITH toks AS (SELECT string_split_regex(trim(text), '\\s+') AS t
       |              FROM documents),
       |pairs AS (SELECT u.w1 AS w1, u.w2 AS w2 FROM (
       |    SELECT unnest(list_transform(range(1, len(t)),
       |        i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS u
       |    FROM toks)),
       |bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_ab
       |       FROM pairs GROUP BY w1, w2 HAVING count(*) >= $floor),
       |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS n_w
       |        FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM pairs),
       |scored AS (SELECT w1 || ' ' || w2 AS bigram, n_ab,
       |    (n_ab * n_pairs * 1000000) // (u1.n_w * u2.n_w) AS pmi_score
       |  FROM bi JOIN uni u1 ON u1.w = bi.w1
       |          JOIN uni u2 ON u2.w = bi.w2
       |          CROSS JOIN tot)
       |SELECT bigram, n_ab, pmi_score FROM scored
       |ORDER BY pmi_score DESC, bigram ASC LIMIT $k""".stripMargin
  }

  /** Replay of TextOps.corpusCard: same fixed-point quality micros,
    * corpus-wide digest duplicate flags, and (count desc, lang asc)
    * top-language argmax. */
  private val textCorpusCardSql: String =
    s"""WITH base AS MATERIALIZED (
       |  SELECT doc_id, source, lang, md5(text) AS digest,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(round(round(
       |      least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.4 +
       |      (CAST(len(list_distinct(toks)) AS DOUBLE) /
       |        CAST(len(toks) AS DOUBLE)) * 0.4 +
       |      (CAST(len(list_filter(toks, s -> s IN $stopSet)) AS DOUBLE) /
       |        CAST(len(toks) AS DOUBLE)) * 0.2, 6)
       |      * 1000000.0) AS BIGINT) AS q_micro
       |  FROM (SELECT doc_id, source, lang, text,
       |          string_split_regex(trim(text), '\\s+') AS toks
       |        FROM documents) t
       |  WHERE len(toks) > 0),
       |dups AS (SELECT digest FROM base GROUP BY digest
       |         HAVING count(*) >= 2),
       |flagged AS (SELECT b.source, b.n_tokens, b.q_micro,
       |    CASE WHEN d.digest IS NOT NULL THEN 1 ELSE 0 END AS is_dup
       |  FROM base b LEFT JOIN dups d USING (digest)),
       |perlang AS (SELECT source, lang, count(*) AS n_lang
       |            FROM base GROUP BY 1, 2),
       |toplang AS (SELECT source, lang AS top_lang FROM (
       |    SELECT source, lang, row_number() OVER (PARTITION BY source
       |      ORDER BY n_lang DESC, lang ASC) AS rn
       |    FROM perlang) r WHERE rn = 1),
       |nlangs AS (SELECT source, CAST(count(*) AS BIGINT) AS n_langs
       |           FROM perlang GROUP BY 1),
       |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |    CAST(sum(q_micro) AS BIGINT) AS q_micro_sum,
       |    CAST(sum(is_dup) AS BIGINT) AS dup_docs
       |  FROM flagged GROUP BY source)
       |SELECT a.source, n_docs, n_tokens,
       |  CAST(q_micro_sum AS DOUBLE) / CAST(n_docs AS DOUBLE) / 1000000.0
       |    AS mean_quality,
       |  n_langs, top_lang, dup_docs,
       |  CAST(dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate
       |FROM agg a JOIN nlangs USING (source) JOIN toplang USING (source)
       |ORDER BY source""".stripMargin

  /** Replay of TextOps.lrTrain: the unrolled micro-quantized GD chain.
    * Per-row doubles use the identical left-to-right expression shape
    * as lrProb; gradient contributions quantize to micro longs BEFORE
    * the sum; DuckDB round() on doubles ≡ the driver's exact-value
    * BigDecimal HALF_UP. */
  /** The LR hard-sigmoid pre-activation as SQL, over weight row alias
    * `w` and features x1..x3 — ONE definition shared by the training
    * chain, the scorer face, and the pretrain capstone so the operand
    * tree can never desynchronize. */
  private def lrZExprSql(w: String): String =
    s"((((CAST($w.w0 AS DOUBLE) / 1000000.0) + " +
      s"(CAST($w.w1 AS DOUBLE) / 1000000.0) * x1) + " +
      s"(CAST($w.w2 AS DOUBLE) / 1000000.0) * x2) + " +
      s"(CAST($w.w3 AS DOUBLE) / 1000000.0) * x3)"

  private lazy val lrChainCtes: String = {
    def zExpr(w: String): String = lrZExprSql(w)
    def pExpr(w: String): String =
      s"greatest(0.0, least(1.0, 0.5 + ${zExpr(w)} / 4.0))"
    def gradCte(g: String, w: String): String =
      s"""$g AS (SELECT
         |  CAST(sum(CAST(round(err * 1000000.0) AS BIGINT)) AS BIGINT) AS g0,
         |  CAST(sum(CAST(round((err * x1) * 1000000.0) AS BIGINT)) AS BIGINT) AS g1,
         |  CAST(sum(CAST(round((err * x2) * 1000000.0) AS BIGINT)) AS BIGINT) AS g2,
         |  CAST(sum(CAST(round((err * x3) * 1000000.0) AS BIGINT)) AS BIGINT) AS g3,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM (SELECT x1, x2, x3, (${pExpr("w")} - y) AS err
         |      FROM f CROSS JOIN $w w) e)""".stripMargin
    def stepCte(wNext: String, w: String, g: String): String = {
      val upd = (0 to 3).map(j =>
        s"w.w$j - CAST(round((CAST(g.g$j AS DOUBLE) * ${TextOps.lrEta}) / " +
          s"CAST(g.n AS DOUBLE)) AS BIGINT) AS w$j").mkString(",\n|  ")
      s"""$wNext AS (SELECT
         |  $upd
         |FROM $w w CROSS JOIN $g g)""".stripMargin
    }
    val rounds = (1 to TextOps.lrRounds).map { r =>
      s"${gradCte(s"g$r", s"w${r - 1}t")},\n${stepCte(s"w${r}t", s"w${r - 1}t", s"g$r")}"
    }.mkString(",\n")
    s"""f AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN round(x3 * 0.4 + x2 * 0.4 + x1 * 0.2, 6)
       |           >= ${TextOps.lrLabelThreshold}
       |      THEN 1.0 ELSE 0.0 END AS y,
       |    x1, x2, x3
       |  FROM (
       |    SELECT doc_id,
       |      CAST(len(list_filter(toks, s -> s IN $stopSet)) AS DOUBLE) /
       |        CAST(len(toks) AS DOUBLE) AS x1,
       |      CAST(len(list_distinct(toks)) AS DOUBLE) /
       |        CAST(len(toks) AS DOUBLE) AS x2,
       |      least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) AS x3
       |    FROM (SELECT doc_id,
       |            string_split_regex(trim(text), '\\s+') AS toks
       |          FROM documents) t
       |    WHERE len(toks) > 0) x),
       |w0t AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
       |               CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3),
       |$rounds""".stripMargin
  }

  private val textQualityLrSql: String = {
    def zExpr: String = lrZExprSql("w")
    val wf = s"w${TextOps.lrRounds}t"
    s"""WITH $lrChainCtes
       |SELECT doc_id, CAST(y AS BIGINT) AS y_label,
       |  round(p, 6) AS score, p >= 0.5 AS pred
       |FROM (SELECT doc_id, y,
       |        greatest(0.0, least(1.0, 0.5 + $zExpr / 4.0)) AS p
       |      FROM f CROSS JOIN $wf w) s
       |ORDER BY doc_id""".stripMargin
  }

  private val textQualityLrWeightsSql: String = {
    val wf = s"w${TextOps.lrRounds}t"
    s"""WITH $lrChainCtes
       |SELECT feature, w_micro FROM (
       |  SELECT 'bias' AS feature, w0 AS w_micro FROM $wf
       |  UNION ALL SELECT 'len_norm', w3 FROM $wf
       |  UNION ALL SELECT 'stopword_ratio', w1 FROM $wf
       |  UNION ALL SELECT 'ttr', w2 FROM $wf) u
       |ORDER BY feature""".stripMargin
  }

  private val textLangIdSql: String = {
    val markers = TextOps.langMarkers.map { case (l, ms) =>
      l -> s"len(list_filter(toks, x -> x IN ${ms.map(sqlStr).mkString("(", ", ", ")")}))"
    }
    s"""WITH t AS (SELECT doc_id, lang,
       |                  string_split_regex(trim(text), '\\s+') AS toks
       |           FROM documents),
       |h AS (SELECT doc_id, lang, ${markers("en")} AS en_h, ${markers("de")} AS de_h,
       |             ${markers("fr")} AS fr_h, ${markers("es")} AS es_h
       |      FROM t)
       |SELECT doc_id,
       |  CASE WHEN greatest(en_h, de_h, fr_h, es_h) = 0 THEN 'und'
       |       WHEN fr_h = greatest(en_h, de_h, fr_h, es_h) THEN 'fr'
       |       WHEN es_h = greatest(en_h, de_h, fr_h, es_h) THEN 'es'
       |       WHEN en_h = greatest(en_h, de_h, fr_h, es_h) THEN 'en'
       |       ELSE 'de' END AS pred_lang,
       |  lang AS labeled_lang
       |FROM h ORDER BY doc_id""".stripMargin
  }

  private val textFingerprintSql: String =
    """SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(
      |    string_split_regex(trim(text), '\s+'))), ' ')) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Gopher-style repetition signals: per-row duplicate-trigram fraction
    * plus an explode→count→max replay of the top-bigram share. */
  private val textRepetitionSql: String =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |           FROM documents),
      |b AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |        CASE WHEN len(toks) >= 3 THEN
      |          CAST(len(toks) - 2 - len(list_distinct(list_transform(
      |                 range(0, len(toks) - 2),
      |                 i -> array_to_string(list_slice(toks, i + 1, i + 3), ' '))))
      |               AS DOUBLE) / (len(toks) - 2)
      |        ELSE 0.0 END AS dup3,
      |        list_transform(range(0, len(toks) - 1),
      |                       i -> toks[i + 1] || ' ' || toks[i + 2]) AS bgs
      |      FROM t),
      |e AS (SELECT doc_id, n_tokens, dup3, unnest(bgs) AS bg FROM b),
      |c AS (SELECT doc_id, bg, max(n_tokens) AS n_tokens, max(dup3) AS dup3,
      |             count(*) AS n
      |      FROM e GROUP BY doc_id, bg),
      |g AS (SELECT doc_id, max(n_tokens) AS n_tokens, max(dup3) AS dup3,
      |             CAST(max(n) AS DOUBLE) / sum(n) AS tbf
      |      FROM c GROUP BY doc_id)
      |SELECT doc_id, n_tokens, tbf AS top_bigram_frac, dup3 AS dup_trigram_frac,
      |       (tbf < 0.05 AND dup3 <= 0.02) AS keep
      |FROM g ORDER BY doc_id""".stripMargin

  /** Deterministic stratified sampling: md5 hex prefix vs per-stratum
    * 4-hex-digit thresholds (floor(rate * 65536)). */
  private val textSampleSql: String = {
    val rows = SampleOps.mixtureRates.toSeq.sorted
      .map { case (l, r) =>
        s"(${sqlStr(l)}, ${sqlStr(f"${math.floor(r * 65536).toInt}%04x")})" }
      .mkString(", ")
    s"""WITH r(lang, thresh) AS (VALUES $rows)
       |SELECT d.doc_id, d.lang, d.source
       |FROM documents d JOIN r ON d.lang = r.lang
       |WHERE substr(md5('${SampleOps.mixtureSeed}:' || CAST(d.doc_id AS VARCHAR)), 1, 4)
       |      < r.thresh
       |ORDER BY d.doc_id""".stripMargin
  }

  /** GPT-style packing: running token offsets per language stream,
    * split at fixed 256-token sequence boundaries. */
  private val textPackSql: String =
    """WITH t AS (SELECT doc_id, lang,
      |                  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
      |                    AS n_tokens
      |           FROM documents),
      |c AS (SELECT doc_id, lang, n_tokens,
      |        CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_off
      |      FROM t)
      |SELECT doc_id, lang, n_tokens, end_off - n_tokens AS start_off,
      |  CAST(floor((end_off - n_tokens) / 256.0) AS BIGINT) AS bin_first,
      |  CAST(floor((end_off - 1) / 256.0) AS BIGINT) AS bin_last,
      |  (CAST(floor((end_off - n_tokens) / 256.0) AS BIGINT)
      |     <> CAST(floor((end_off - 1) / 256.0) AS BIGINT)) AS straddles
      |FROM c ORDER BY doc_id""".stripMargin

  // text_chunks: pure integer chunk arithmetic + list slicing — both
  // engines tokenize with the same \s+ regex split (the text_pack
  // precedent) and the chunk text re-joins with single spaces, so the
  // replay is exact.
  private val textChunksSql: String =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |           FROM documents),
      |s AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_toks
      |      FROM t WHERE len(toks) > 0),
      |c AS (SELECT doc_id, n_toks, toks,
      |        CASE WHEN n_toks <= 64 THEN 1
      |             ELSE (n_toks - 64 + 47) // 48 + 1 END AS n_chunks
      |      FROM s),
      |e AS (SELECT doc_id, n_toks, toks,
      |        unnest(generate_series(0, n_chunks - 1)) AS cid
      |      FROM c)
      |SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id,
      |  CAST(cid * 48 AS BIGINT) AS start_tok,
      |  CAST(least(64, n_toks - cid * 48) AS BIGINT) AS chunk_len,
      |  array_to_string(list_slice(toks, cid * 48 + 1,
      |    cid * 48 + least(64, n_toks - cid * 48)), ' ') AS chunk_text
      |FROM e ORDER BY doc_id, chunk_id""".stripMargin

  /** Replay of TextOps.boilerplateScrub: non-overlapping 8-token
    * chunks, chunk-df over distinct docs, drop df > 2, reassemble in
    * chunk order. string_agg over zero kept rows is NULL — matching
    * Spark's explicit null for all-boilerplate docs. */
  private val textBoilerplateSql: String =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |           FROM documents),
      |s AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_toks
      |      FROM t WHERE len(toks) > 0),
      |ch AS (SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id,
      |         array_to_string(list_slice(toks, cid * 8 + 1,
      |           cid * 8 + least(8, n_toks - cid * 8)), ' ') AS chunk
      |       FROM (SELECT doc_id, toks, n_toks,
      |               unnest(generate_series(0, (n_toks + 7) // 8 - 1)) AS cid
      |             FROM s) e),
      |boiler AS (SELECT chunk FROM (
      |    SELECT chunk, count(DISTINCT doc_id) AS df FROM ch GROUP BY 1) z
      |  WHERE df > 2),
      |kept AS (SELECT c.doc_id, c.chunk_id, c.chunk FROM ch c
      |         WHERE NOT EXISTS (SELECT 1 FROM boiler b WHERE b.chunk = c.chunk)),
      |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
      |        FROM ch GROUP BY 1),
      |cl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
      |         string_agg(chunk, ' ' ORDER BY chunk_id) AS clean_text
      |       FROM kept GROUP BY 1)
      |SELECT t.doc_id, t.n_chunks,
      |  t.n_chunks - coalesce(cl.n_kept, 0) AS n_dropped, cl.clean_text
      |FROM tot t LEFT JOIN cl USING (doc_id) ORDER BY t.doc_id""".stripMargin

  /** Replay of TextOps.sourceDrift: exact token counts, the identical
    * IEEE (obs−exp)²/exp tree, 2⁻²⁰ fixed-point quantization, exact
    * long sums — the log-free drift statistic. */
  private val textDriftSql: String = {
    val exp = "CAST(g AS DOUBLE) * CAST(st AS DOUBLE) / CAST(tot AS DOUBLE)"
    s"""WITH t AS (SELECT source,
       |        unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |      FROM documents),
       |f AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS obs
       |      FROM t WHERE len(tok) > 0 GROUP BY 1, 2),
       |g AS (SELECT tok, CAST(sum(obs) AS BIGINT) AS g FROM f GROUP BY 1),
       |s AS (SELECT source, CAST(sum(obs) AS BIGINT) AS st FROM f GROUP BY 1),
       |tt AS (SELECT CAST(sum(g) AS BIGINT) AS tot FROM g),
       |grid AS (SELECT s.source, s.st, g.tok, g.g, tt.tot,
       |        CAST(coalesce(f.obs, 0) AS DOUBLE) AS obs_d
       |      FROM s CROSS JOIN g CROSS JOIN tt
       |      LEFT JOIN f ON f.source = s.source AND f.tok = g.tok),
       |terms AS (SELECT source, st,
       |    CAST(floor((obs_d - $exp) * (obs_d - $exp) / ($exp)
       |      * 1048576) AS BIGINT) AS q
       |  FROM grid)
       |SELECT source, max(st) AS n_tokens,
       |  round(CAST(sum(q) AS DOUBLE) / 1048576, 4) AS chi2
       |FROM terms GROUP BY source ORDER BY source""".stripMargin
  }

  // text_vocab_coverage: top-k token-type coverage of all token
  // occurrences; (cnt DESC, tok) is a total order so row_number replays
  // the scale-safe global rank exactly.
  private val textVocabCoverageSql: String =
    """WITH t AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
      |           FROM documents),
      |tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
      |       FROM t WHERE len(tok) > 0 GROUP BY 1),
      |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rn
      |      FROM tf),
      |a AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
      |        CAST(sum(CASE WHEN rn <= 10 THEN cnt END) AS BIGINT) AS c10,
      |        CAST(sum(CASE WHEN rn <= 100 THEN cnt END) AS BIGINT) AS c100,
      |        CAST(sum(CASE WHEN rn <= 1000 THEN cnt END) AS BIGINT) AS c1000
      |      FROM r),
      |s AS (SELECT CAST(10 AS BIGINT) AS k, c10 AS covered, total FROM a
      |      UNION ALL SELECT 100, c100, total FROM a
      |      UNION ALL SELECT 1000, c1000, total FROM a)
      |SELECT k, covered, total,
      |  round(CAST(covered AS DOUBLE) / total, 6) AS coverage
      |FROM s ORDER BY k""".stripMargin

  /** BPE word-count reduction shared by both tokenizer-training
    * oracles: whitespace words (the tokens() regex), separator-bearing
    * words excluded in BOTH engines (chr(31) = the Spark side's
    * BpeSep). */
  private val bpeWordsCte: String =
    """w AS (SELECT w, CAST(count(*) AS BIGINT) AS freq
      |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
      |        FROM documents) t
      |  WHERE len(w) > 0 AND NOT contains(w, chr(31))
      |  GROUP BY w)""".stripMargin

  /** Replay of TextOps.bpePairs: within-word adjacent character pairs
    * weighted by word frequency; top-20 under the (n desc, pair asc)
    * total order. substr/substring are character-based in both
    * engines. */
  private val textBpePairsSql: String =
    s"""WITH $bpeWordsCte
       |SELECT pair, CAST(sum(freq) AS BIGINT) AS n
       |FROM (SELECT unnest(list_transform(range(1, len(w)),
       |        i -> substr(w, i, 2))) AS pair, freq
       |      FROM w WHERE len(w) >= 2) p
       |GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 20""".stripMargin

  /** Replay of TextOps.bpeMerges (3 rounds): the segmentation rides as
    * a chr(31)-anchored symbol string; each round is a pair-count
    * aggregate, a (n desc, a, b) argmax, and the SAME greedy
    * left-to-right fold the Spark side runs — Spark `aggregate()` with
    * a string accumulator ≡ DuckDB `list_reduce(list_prepend(␟, …))`
    * with the identical lambda, so the segmentations agree
    * string-for-string and every round hash-checks. */
  /** The 3-round BPE training chain (shared by the merges and
    * fertility oracles): w → e1 → (p1, b1, e2) → … → e4, the word
    * riding through so fertility can weight by character length. */
  private val bpeChainCtes: String = {
    def pairCte(p: String, e: String): String =
      s"""$p AS (SELECT p.a AS a, p.b AS b, CAST(sum(freq) AS BIGINT) AS n
         |  FROM (SELECT unnest(list_transform(range(1, len(syms)),
         |          i -> {'a': syms[i], 'b': syms[i+1]})) AS p, freq
         |        FROM (SELECT string_split(trim(enc, chr(31)), chr(31)) AS syms,
         |                     freq
         |              FROM $e) s) t
         |  GROUP BY a, b)""".stripMargin
    def bestCte(b: String, p: String): String =
      s"$b AS (SELECT a, b, n FROM $p ORDER BY n DESC, a ASC, b ASC LIMIT 1)"
    def rewriteCte(eNext: String, e: String, b: String): String =
      s"""$eNext AS (SELECT w, list_reduce(
         |    list_prepend(chr(31), string_split(trim(enc, chr(31)), chr(31))),
         |    (acc, x) -> CASE
         |      WHEN ends_with(acc, chr(31) || mb.a || chr(31)) AND x = mb.b
         |      THEN left(acc, len(acc) - len(mb.a) - 1) || mb.a || mb.b || chr(31)
         |      ELSE acc || x || chr(31) END) AS enc,
         |  freq FROM $e CROSS JOIN (SELECT a, b FROM $b) mb)""".stripMargin
    s"""$bpeWordsCte,
       |e1 AS (SELECT w, chr(31) ||
       |    array_to_string(string_split(w, ''), chr(31)) || chr(31) AS enc,
       |    freq FROM w),
       |${pairCte("p1", "e1")},
       |${bestCte("b1", "p1")},
       |${rewriteCte("e2", "e1", "b1")},
       |${pairCte("p2", "e2")},
       |${bestCte("b2", "p2")},
       |${rewriteCte("e3", "e2", "b2")},
       |${pairCte("p3", "e3")},
       |${bestCte("b3", "p3")},
       |${rewriteCte("e4", "e3", "b3")}""".stripMargin
  }

  private val textBpeMergesSql: String =
    s"""WITH $bpeChainCtes
       |SELECT merge_rank, lhs, rhs, lhs || rhs AS merged, n FROM (
       |  SELECT CAST(1 AS BIGINT) AS merge_rank, a AS lhs, b AS rhs, n FROM b1
       |  UNION ALL
       |  SELECT CAST(2 AS BIGINT), a, b, n FROM b2
       |  UNION ALL
       |  SELECT CAST(3 AS BIGINT), a, b, n FROM b3) u
       |ORDER BY merge_rank""".stripMargin

  /** Replay of TextOps.bpeFertility: exact integer counts off the
    * final (e4) segmentation, one IEEE division for the ratio. */
  private val textBpeFertilitySql: String =
    s"""WITH $bpeChainCtes
       |SELECT CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(freq) AS BIGINT) AS total_freq,
       |  CAST(sum(freq * len(w)) AS BIGINT) AS chars_weighted,
       |  CAST(sum(freq * n_syms) AS BIGINT) AS syms_weighted,
       |  round(CAST(sum(freq * n_syms) AS DOUBLE) /
       |        CAST(sum(freq * len(w)) AS DOUBLE), 6) AS compression
       |FROM (SELECT w, freq,
       |        CAST(len(string_split(trim(enc, chr(31)), chr(31))) AS BIGINT)
       |          AS n_syms
       |      FROM e4) t""".stripMargin

  /** Replay of TextOps.bpeCurve: one fertility-shaped aggregate per
    * chain stage e1..e4, union'd with the round index. */
  private val textBpeCurveSql: String = {
    val stages = (1 to 4).map { i =>
      s"""SELECT CAST(${i - 1} AS BIGINT) AS round,
         |  CAST(sum(freq * n_syms) AS BIGINT) AS syms_weighted,
         |  CAST(sum(freq * len(w)) AS BIGINT) AS chars_weighted,
         |  round(CAST(sum(freq * n_syms) AS DOUBLE) /
         |        CAST(sum(freq * len(w)) AS DOUBLE), 6) AS compression
         |FROM (SELECT w, freq,
         |        CAST(len(string_split(trim(enc, chr(31)), chr(31)))
         |          AS BIGINT) AS n_syms
         |      FROM e$i) t$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $bpeChainCtes
       |SELECT * FROM (
       |$stages) u
       |ORDER BY round""".stripMargin
  }

  /** Replay of TextOps.bpeTokensPerDoc: the e4 segmentation's symbol
    * counts joined to the per-doc word stream — same tokenization and
    * separator-word exclusion as the chain itself. */
  private val textBpeTokensSql: String =
    s"""WITH $bpeChainCtes,
       |seg AS (SELECT w,
       |    CAST(len(string_split(trim(enc, chr(31)), chr(31))) AS BIGINT)
       |      AS n_syms
       |  FROM e4),
       |dw AS (SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
       |    FROM documents) t
       |  WHERE len(w) > 0 AND NOT contains(w, chr(31)))
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(n_syms) AS BIGINT) AS n_tokens,
       |  CAST(sum(n_syms) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |    AS tokens_per_word
       |FROM dw JOIN seg USING (w)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Replay of Relational.corpusDiff: snapshot B derives from the same
    * deterministic %13/%17/%19 rules, digests compare md5 over the
    * text's UTF-8 bytes in both engines, USING resolves the full-outer
    * key to the coalesced doc_id. */
  private val qCorpusDiffSql: String =
    """WITH a AS (SELECT doc_id, md5(text) AS h_a FROM documents),
      |v2 AS (SELECT doc_id,
      |         CASE WHEN doc_id % 17 = 0 THEN text || ' [rev2]' ELSE text END AS text
      |       FROM documents WHERE doc_id % 13 <> 0
      |       UNION ALL
      |       SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 19 = 0),
      |b AS (SELECT doc_id, md5(text) AS h_b FROM v2),
      |d AS (SELECT doc_id,
      |        CASE WHEN h_a IS NULL THEN 'added'
      |             WHEN h_b IS NULL THEN 'removed'
      |             WHEN h_a = h_b THEN 'unchanged'
      |             ELSE 'changed' END AS status
      |      FROM a FULL OUTER JOIN b USING (doc_id))
      |SELECT status, CAST(count(*) AS BIGINT) AS n,
      |       min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM d GROUP BY status ORDER BY status""".stripMargin

  /** Bigram-LM quality score replay: identical integer construction —
    * add-one-smoothed (c_ab+1)/(c_a+V) quantized by EXACT integer
    * division to the 2⁻²⁰ grid, per-doc exact integer sum, one final
    * IEEE division — so the score hash-matches bit-for-bit (no libm
    * ln() anywhere; parallel unnest zips the head/tail lists). */
  private val textLmScoreSql: String =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      |              FROM documents),
      |bg AS (SELECT doc_id,
      |         unnest(list_transform(range(1, len(t)), i -> t[i])) AS a,
      |         unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS b
      |       FROM toks WHERE len(t) >= 2),
      |v AS (SELECT count(DISTINCT w) AS vocab
      |      FROM (SELECT unnest(t) AS w FROM toks)),
      |cab AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY a, b),
      |ca AS (SELECT a, count(*) AS c_a FROM bg GROUP BY a),
      |scored AS (SELECT doc_id, c_ab,
      |             ((c_ab + 1) * 1048576) // (c_a + vocab) AS p_q
      |           FROM bg JOIN cab USING (a, b) JOIN ca USING (a) CROSS JOIN v)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(CASE WHEN c_ab = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
      |  round(CAST(sum(p_q) AS DOUBLE) / (count(*) * 1048576.0), 6) AS lm_score
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // text_novelty: distinct word 3-gram shingles per doc (the
  // shinglesComposable recipe: window starts 0..max(n-3,0), slice
  // end-bounded), shingle -> df aggregate, join back, one IEEE division
  // of exact counts.
  private val textNoveltySql: String =
    """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |           FROM documents),
      |g AS (SELECT doc_id, toks,
      |        unnest(generate_series(0, greatest(len(toks) - 3, 0))) AS i
      |      FROM t),
      |sh AS (SELECT DISTINCT doc_id,
      |         array_to_string(list_slice(toks, i + 1, i + 3), ' ') AS s
      |       FROM g),
      |shf AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
      |f AS (SELECT s, count(*) AS df FROM shf GROUP BY 1)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
      |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
      |  round(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |        / count(*), 6) AS novelty
      |FROM shf JOIN f USING (s) GROUP BY 1 ORDER BY doc_id""".stripMargin

  private val qPiiScrubSql: String =
    """SELECT c_custkey,
      |  regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
      |  CAST(length(c_name) - length(regexp_replace(c_name, '[0-9]', '', 'g'))
      |       AS BIGINT) AS n_masked
      |FROM customer ORDER BY c_custkey""".stripMargin

  private val qModeMedianSql: String =
    """WITH cnt AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
      |             FROM customer GROUP BY 1, 2),
      |m AS (SELECT c_nationkey, c_mktsegment AS mode_segment,
      |        row_number() OVER (PARTITION BY c_nationkey
      |                           ORDER BY n DESC, c_mktsegment ASC) AS rnk
      |      FROM cnt),
      |md AS (SELECT c_nationkey, round(median(c_acctbal), 4) AS median_acctbal,
      |              count(*) AS n_customers
      |       FROM customer GROUP BY 1)
      |SELECT md.c_nationkey, m.mode_segment, md.median_acctbal, md.n_customers
      |FROM md JOIN m ON md.c_nationkey = m.c_nationkey AND m.rnk = 1
      |ORDER BY md.c_nationkey""".stripMargin

  private val qUnpivotSql: String =
    """SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value
      |FROM part
      |UNION ALL
      |SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value
      |FROM part
      |ORDER BY p_partkey, measure""".stripMargin

  private val dedupExactSql: String =
    """SELECT md5(text) AS h, count(*) AS n_docs, min(doc_id) AS keeper
      |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin

  /** Incremental-dedup replay: the Bloom prefilter is an optimization
    * that cannot change the answer (false positives are removed by the
    * exact verify join), so the oracle is the plain anti-join over the
    * same seeded-md5 batch/historical split. */
  private val dedupIncrementalSql: String =
    s"""WITH d AS (SELECT doc_id, md5(text) AS digest,
       |             substr(md5('${DedupOps.incSplitSeed}:' || CAST(doc_id AS VARCHAR)), 1, 1)
       |               < '${DedupOps.incBatchHex}' AS is_batch
       |           FROM documents),
       |hist AS (SELECT DISTINCT digest FROM d WHERE NOT is_batch),
       |batch AS (SELECT digest, min(doc_id) AS doc_id
       |          FROM d WHERE is_batch GROUP BY 1)
       |SELECT b.doc_id, b.digest FROM batch b
       |WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.digest = b.digest)
       |ORDER BY doc_id""".stripMargin

  /** True Jaccard over all shared-shingle candidate pairs — result-
    * equivalent to the Spark side's lossless prefix-filtered join. */
  private val dedupNgramJaccardSql: String =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      |              FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(
      |         range(0, greatest(len(t) - 3, 0) + 1),
      |         i -> array_to_string(list_slice(t, i + 1, i + 3), ' '))) AS s
      |       FROM toks),
      |ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |         FROM ex a JOIN ex b
      |           ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
      |v AS (SELECT doc_a, doc_b,
      |        len(list_intersect(sa.s, sb.s)) AS common,
      |        len(sa.s) AS na, len(sb.s) AS nb
      |      FROM cand
      |      JOIN sh sa ON sa.doc_id = doc_a
      |      JOIN sh sb ON sb.doc_id = doc_b)
      |SELECT doc_a, doc_b,
      |       round(CAST(common AS DOUBLE) / (na + nb - common), 6) AS jaccard
      |FROM v
      |WHERE round(CAST(common AS DOUBLE) / (na + nb - common), 6) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Replay of DedupOps.lshEval: the exact-Jaccard truth chain and the
    * md5-mode banded candidate chain in one statement, then the
    * one-row recall/precision report in fixed-point micros. */
  private val dedupLshEvalSql: String =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      |              FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(
      |         range(0, greatest(len(t) - 3, 0) + 1),
      |         i -> array_to_string(list_slice(t, i + 1, i + 3), ' '))) AS s
      |       FROM toks),
      |ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
      |tcand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |          FROM ex a JOIN ex b
      |            ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
      |tv AS (SELECT doc_a, doc_b,
      |         len(list_intersect(sa.s, sb.s)) AS common,
      |         len(sa.s) AS na, len(sb.s) AS nb
      |       FROM tcand
      |       JOIN sh sa ON sa.doc_id = doc_a
      |       JOIN sh sb ON sb.doc_id = doc_b),
      |truth AS (SELECT doc_a, doc_b FROM tv
      |          WHERE round(CAST(common AS DOUBLE) / (na + nb - common), 6) >= 0.8),
      |hs AS (SELECT doc_id,
      |         CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % 4294967296 AS h32
      |       FROM (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE len(s) > 0)),
      |sig AS (SELECT doc_id, j,
      |          min((h32 * (2*j+1) + (982451653 * (j+1) % 2305843009213693951))
      |              % 2305843009213693951) AS m
      |        FROM hs CROSS JOIN generate_series(0, 31) AS g(j)
      |        GROUP BY doc_id, j),
      |band AS (SELECT doc_id, j // 4 AS band, string_agg(m, ',' ORDER BY j) AS bkey
      |         FROM sig GROUP BY doc_id, j // 4),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |         FROM band a JOIN band b
      |           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
      |cs AS (SELECT CAST(count(*) AS BIGINT) AS n_cand,
      |              CAST(count(t.doc_a) AS BIGINT) AS n_hit
      |       FROM cand c LEFT JOIN truth t
      |         ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b),
      |ts AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth)
      |SELECT n_truth, n_cand, n_hit,
      |  CASE WHEN n_truth = 0 THEN NULL
      |       ELSE (n_hit * 1000000) // n_truth END AS recall_micro,
      |  CASE WHEN n_cand = 0 THEN NULL
      |       ELSE (n_hit * 1000000) // n_cand END AS precision_micro
      |FROM cs CROSS JOIN ts""".stripMargin

  /** Full replication of the md5-mode MinHash-LSH pipeline: md5-60 base
    * hashes (engine-neutral — see TextHashUtil.md5_60), the same k=32
    * (a·h+b) mod p permutation minima, 8 bands of 4 rows keyed by the
    * comma-joined signature slice, candidate pairs on any agreeing band,
    * exact-Jaccard verification at t=0.8. Every arithmetic step stays in
    * BIGINT range on both engines, so the pair set hash-matches exactly
    * (LSH recall misses and all). */
  private val dedupMinhashLshSql: String =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      |              FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(
      |         range(0, greatest(len(t) - 3, 0) + 1),
      |         i -> array_to_string(list_slice(t, i + 1, i + 3), ' '))) AS s
      |       FROM toks),
      |ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE len(s) > 0),
      |hs AS (SELECT doc_id,
      |         CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % 4294967296 AS h32
      |       FROM ex),
      |sig AS (SELECT doc_id, j,
      |          min((h32 * (2*j+1) + (982451653 * (j+1) % 2305843009213693951))
      |              % 2305843009213693951) AS m
      |        FROM hs CROSS JOIN generate_series(0, 31) AS g(j)
      |        GROUP BY doc_id, j),
      |band AS (SELECT doc_id, j // 4 AS band, string_agg(m, ',' ORDER BY j) AS bkey
      |         FROM sig GROUP BY doc_id, j // 4),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |         FROM band a JOIN band b
      |           ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
      |v AS (SELECT doc_a, doc_b,
      |        len(list_intersect(sa.s, sb.s)) AS common,
      |        len(sa.s) AS na, len(sb.s) AS nb
      |      FROM cand
      |      JOIN sh sa ON sa.doc_id = doc_a
      |      JOIN sh sb ON sb.doc_id = doc_b)
      |SELECT doc_a, doc_b,
      |       round(CAST(common AS DOUBLE) / (na + nb - common), 6) AS jaccard
      |FROM v
      |WHERE round(CAST(common AS DOUBLE) / (na + nb - common), 6) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Incremental near-dup replay: the same md5-mode signature → banding
    * chain as `dedup_minhash_lsh`, but candidates are restricted to
    * batch×historical (the persisted-index admission test) and rolled
    * up per batch document. The oracle replays the INDEX's decision —
    * LSH misses included — not ground-truth Jaccard. */
  private val dedupIncrementalNearSql: String =
    s"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
       |              FROM documents),
       |sh AS (SELECT doc_id, list_distinct(list_transform(
       |         range(0, greatest(len(t) - 3, 0) + 1),
       |         i -> array_to_string(list_slice(t, i + 1, i + 3), ' '))) AS s
       |       FROM toks),
       |ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE len(s) > 0),
       |hs AS (SELECT doc_id,
       |         CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % 4294967296 AS h32
       |       FROM ex),
       |sig AS (SELECT doc_id, j,
       |          min((h32 * (2*j+1) + (982451653 * (j+1) % 2305843009213693951))
       |              % 2305843009213693951) AS m
       |        FROM hs CROSS JOIN generate_series(0, 31) AS g(j)
       |        GROUP BY doc_id, j),
       |band AS (SELECT doc_id, j // 4 AS band, string_agg(m, ',' ORDER BY j) AS bkey
       |         FROM sig GROUP BY doc_id, j // 4),
       |flag AS (SELECT doc_id,
       |           substr(md5('${DedupOps.incSplitSeed}:' || CAST(doc_id AS VARCHAR)), 1, 1)
       |             < '${DedupOps.incBatchHex}' AS is_batch
       |         FROM documents),
       |cand AS (SELECT DISTINCT h.doc_id AS hist_id, b.doc_id AS batch_id
       |         FROM band h
       |         JOIN flag fh ON fh.doc_id = h.doc_id AND NOT fh.is_batch
       |         JOIN band b ON h.band = b.band AND h.bkey = b.bkey
       |         JOIN flag fb ON fb.doc_id = b.doc_id AND fb.is_batch),
       |v AS (SELECT hist_id, batch_id,
       |        len(list_intersect(sa.s, sb.s)) AS common,
       |        len(sa.s) AS na, len(sb.s) AS nb
       |      FROM cand
       |      JOIN sh sa ON sa.doc_id = hist_id
       |      JOIN sh sb ON sb.doc_id = batch_id),
       |m AS (SELECT batch_id, count(*) AS n_matches, min(hist_id) AS nearest_hist
       |      FROM v
       |      WHERE round(CAST(common AS DOUBLE) / (na + nb - common), 6) >= 0.8
       |      GROUP BY batch_id)
       |SELECT f.doc_id, coalesce(m.n_matches, 0) AS n_near_dups, m.nearest_hist,
       |       coalesce(m.n_matches, 0) = 0 AS kept
       |FROM flag f LEFT JOIN m ON m.batch_id = f.doc_id
       |WHERE f.is_batch ORDER BY f.doc_id""".stripMargin

  /** Oracle for the md5-mode SimHash query: the blocking scheme is
    * exhaustive at the radius (pigeonhole over maxHamming+1 blocks), so
    * the Spark result provably equals the exact Hamming self-join over
    * the engine-neutral fingerprints — which is what this computes
    * (majority vote per bit over distinct md5-60 token hashes). */
  private val dedupSimhashSql: String =
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      |              FROM documents),
      |tok AS (SELECT DISTINCT doc_id, unnest(t) AS tok FROM toks),
      |h AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
      |      FROM tok),
      |v AS (SELECT doc_id, b,
      |        sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      |      FROM h CROSS JOIN generate_series(0, 63) AS g(b)
      |      GROUP BY doc_id, b),
      |fp AS (SELECT doc_id,
      |         CAST(sum(CASE WHEN vote > 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS fp
      |       FROM v GROUP BY doc_id)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
      |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.fp, b.fp)) <= 8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Connected components over the verified Jaccard pairs via a
    * recursive CTE (min label reachable from each node), keeper = min
    * doc_id per component — mirrors DedupOps.dedupClusters' iterative
    * min-label propagation. */
  /** Shared CTE chain for the cluster oracles: shingles → verified
    * pairs → recursive label walk (ground truth for the pointer-jumping
    * loop). */
  private val dedupClusterCtes: String =
    """WITH RECURSIVE toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      |              FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(
      |         range(0, greatest(len(t) - 3, 0) + 1),
      |         i -> array_to_string(list_slice(t, i + 1, i + 3), ' '))) AS s
      |       FROM toks),
      |ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |         FROM ex a JOIN ex b
      |           ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
      |v AS (SELECT doc_a, doc_b,
      |        len(list_intersect(sa.s, sb.s)) AS common,
      |        len(sa.s) AS na, len(sb.s) AS nb
      |      FROM cand
      |      JOIN sh sa ON sa.doc_id = doc_a
      |      JOIN sh sb ON sb.doc_id = doc_b),
      |pairs AS (SELECT doc_a, doc_b FROM v
      |          WHERE round(CAST(common AS DOUBLE) / (na + nb - common), 6) >= 0.8),
      |edges AS (SELECT doc_a AS u, doc_b AS w FROM pairs
      |          UNION ALL SELECT doc_b, doc_a FROM pairs),
      |walk(u, label) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      |  UNION
      |  SELECT e.u, w2.label FROM edges e JOIN walk w2 ON e.w = w2.u
      |)""".stripMargin

  // dedup_weights: count-preserving dedup — keeper carries cluster
  // size, losers 0, unclustered 1; sum(weight) = corpus size.
  private val dedupWeightsSql: String =
    s"""$dedupClusterCtes,
      |cl AS (SELECT u AS doc_id, min(label) AS cluster FROM walk GROUP BY u),
      |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size
      |       FROM cl GROUP BY 1),
      |w AS (SELECT cl.doc_id,
      |        CASE WHEN cl.doc_id = cl.cluster THEN sz.cluster_size
      |             ELSE CAST(0 AS BIGINT) END AS w
      |      FROM cl JOIN sz USING (cluster))
      |SELECT d.doc_id, coalesce(w.w, CAST(1 AS BIGINT)) AS weight
      |FROM (SELECT doc_id FROM documents) d
      |LEFT JOIN w ON w.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  private val dedupClustersSql: String =
    s"""$dedupClusterCtes
      |SELECT u AS doc_id, min(label) AS cluster,
      |       (u = min(label)) AS is_keeper
      |FROM walk GROUP BY u ORDER BY doc_id""".stripMargin

  private val dedupKeeperQualitySql: String =
    s"""$dedupClusterCtes,
      |cl AS (SELECT u AS doc_id, min(label) AS cluster FROM walk GROUP BY u),
      |qx AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS nt,
      |        CAST(len(list_distinct(t)) AS DOUBLE) AS nd,
      |        CAST(len(list_filter(t, y -> y IN $stopSet)) AS DOUBLE) AS ns
      |      FROM toks),
      |q AS (SELECT doc_id,
      |        round(least(nt / 100.0, 1.0) * 0.4 + (nd / nt) * 0.4
      |              + (ns / nt) * 0.2, 6) AS quality
      |      FROM qx),
      |rk AS (SELECT cluster, doc_id, quality,
      |         row_number() OVER (PARTITION BY cluster
      |                            ORDER BY quality DESC, doc_id ASC) AS rn,
      |         count(*) OVER (PARTITION BY cluster) AS n_docs,
      |         max(quality) OVER (PARTITION BY cluster) AS maxq
      |       FROM cl JOIN q USING (doc_id))
      |SELECT cluster, n_docs, doc_id AS keeper, maxq AS keeper_quality
      |FROM rk WHERE rn = 1 ORDER BY cluster""".stripMargin

  private val simBruteForceSql: String =
    """WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
      |sims AS (SELECT qid, vec_id, round(
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(qvec[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(qvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))), 6) AS cos
      |  FROM q, c),
      |ranked AS (SELECT qid, vec_id, cos,
      |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
      |  FROM sims)
      |SELECT qid, rnk AS "rank", vec_id, cos FROM ranked WHERE rnk <= 5
      |ORDER BY qid, rnk""".stripMargin

  /** Brute force over the bounded `vec_id < 256` slice — the comparison
    * surface of the capped lossless-PQ endpoint (see SimilarityOps
    * .pqExact). */
  private val simBruteForceCappedSql: String =
    simBruteForceSql.replace("WHERE vec_id >= 5",
      "WHERE vec_id >= 5 AND vec_id < 256")

  /** Replay of Relational.hllNdv — the md5-60 hash, bucket/rank split,
    * exact-integer register sum and the single float division. The α·m²
    * ·2^52 numerator is inlined as one double literal (Double.toString
    * round-trips, strtod is correctly rounded) so both engines divide
    * the identical double. */
  private val qSketchesSql: String = {
    val m = graft.operators.Relational.hllM
    val alphaNum = graft.operators.Relational.hllAlphaNum
    s"""WITH t AS (
       |  SELECT l_returnflag AS flag, 'orders' AS key_col,
       |    CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |  FROM lineitem
       |  UNION ALL
       |  SELECT l_returnflag, 'parts',
       |    CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT)
       |  FROM lineitem),
       |r AS (SELECT flag, key_col, h % $m AS bucket,
       |    CASE WHEN h // $m = 0 THEN 52 ELSE 52 - length(bin(h // $m)) END AS rank
       |  FROM t),
       |g AS (SELECT flag, key_col, bucket, max(rank) AS mr FROM r GROUP BY 1, 2, 3),
       |s AS (SELECT flag, key_col,
       |    CAST(sum(CAST(1 AS BIGINT) << (52 - mr)) +
       |         ($m - count(*)) * (CAST(1 AS BIGINT) << 52) AS BIGINT) AS reg_sum,
       |    $m - count(*) AS zeros
       |  FROM g GROUP BY 1, 2)
       |SELECT flag AS l_returnflag, key_col, reg_sum, zeros,
       |  round($alphaNum / CAST(reg_sum AS DOUBLE), 4) AS raw_est
       |FROM s ORDER BY l_returnflag, key_col""".stripMargin
  }

  /** In-order cosine over `d` dims — the numeric contract shared by the
    * CosineSimilarity/TopCentroidIds kernels: separate in-order folds
    * for the dot and both squared norms, then dot/(sqrt·sqrt). */
  private def cosSql(a: String, b: String, d: Int = 64): String = {
    def fold(x: String, y: String) =
      s"list_sum(list_transform(range(1, ${d + 1}), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
    s"${fold(a, b)} / (sqrt(${fold(a, a)}) * sqrt(${fold(b, b)}))"
  }

  /** Replay of SimilarityOps.dimCurve: per-dim brute-force rankings
    * (cosSql over the first d components ≡ the Spark slice) joined
    * against the full-dimension ranking. */
  private val simDimCurveSql: String = {
    val (nq, k) = (5, 5)
    val denom = (nq * k).toDouble
    def rankedCte(d: Int): String =
      s"""ranked$d AS MATERIALIZED (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, c.vec_id,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY round(${cosSql("qvec", "c.embedding", d)}, 6) DESC,
         |        c.vec_id ASC) AS rnk
         |    FROM q, c) r
         |  WHERE rnk <= $k)""".stripMargin
    val ctes = SimilarityOps.dimCurveDims.map(rankedCte).mkString(",\n")
    val rows = SimilarityOps.dimCurveDims.map { d =>
      s"""SELECT CAST($d AS BIGINT) AS dim,
         |  CAST(count(*) AS BIGINT) AS n_hits,
         |  CAST(count(*) AS DOUBLE) / $denom AS recall
         |FROM ranked$d t$d JOIN ranked64 f$d USING (qid, vec_id)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec
       |           FROM embeddings WHERE vec_id < $nq),
       |c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= $nq),
       |$ctes
       |SELECT * FROM (
       |$rows) u
       |ORDER BY dim""".stripMargin
  }

  /** Replay of SimilarityOps.mmrSelect: the same top-C relevance pool,
    * the same C×C round-6 pairwise cosines, and the greedy chain
    * unrolled into k step CTEs — each step's argmax is the identical
    * (mmr DESC, vec_id) total order. */
  private val simMmrSql: String = {
    val lam = SimilarityOps.mmrLambda
    val mu = SimilarityOps.mmrMu
    val c = SimilarityOps.mmrPoolSize
    val k = SimilarityOps.mmrK
    def prevUnion(n: Int): String =
      (1 until n).map(j => s"SELECT vec_id FROM s$j").mkString(" UNION ALL ")
    // every step CTE is MATERIALIZED: s_n references s_1..s_{n-1}, so an
    // inlining planner would re-expand the chain exponentially
    val steps = (2 to k).map { n =>
      s"""m$n AS MATERIALIZED (SELECT c.vec_id, c.rel, max(p.cos) AS ms
         |  FROM pool c JOIN psim p ON p.a = c.vec_id
         |  WHERE p.b IN (${prevUnion(n)})
         |    AND c.vec_id NOT IN (${prevUnion(n)})
         |  GROUP BY c.vec_id, c.rel),
         |s$n AS MATERIALIZED (SELECT vec_id, rel, ms,
         |  ($lam * rel - $mu * ms) AS mmr
         |  FROM m$n ORDER BY mmr DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (1 to k).map(n =>
      s"""SELECT CAST($n AS BIGINT) AS "rank", vec_id, rel, ms AS max_sim, mmr FROM s$n""")
      .mkString("\n  UNION ALL ")
    s"""WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
       |pool AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |    round(${cosSql("qvec", "embedding")}, 6) AS rel
       |  FROM embeddings, q WHERE vec_id > 0
       |  ORDER BY rel DESC, vec_id ASC LIMIT $c),
       |psim AS MATERIALIZED (
       |  SELECT p1.vec_id AS a, p2.vec_id AS b,
       |    round(${cosSql("p1.embedding", "p2.embedding")}, 6) AS cos
       |  FROM pool p1, pool p2 WHERE p1.vec_id <> p2.vec_id),
       |s1 AS MATERIALIZED (SELECT vec_id, rel, 0.0 AS ms,
       |  ($lam * rel - $mu * 0.0) AS mmr
       |  FROM pool ORDER BY mmr DESC, vec_id LIMIT 1),
       |$steps
       |$out
       |ORDER BY "rank"""".stripMargin
  }

  /** Full replay of the TRAINED IVF face (SimilarityOps.ivfTopK):
    * 2 unrolled Lloyd's rounds — assignment by in-order cosine argmax
    * (ties to the lowest cid, exactly the TopCentroidIds contract) and
    * cluster means in 2⁻²⁰ fixed point with truncating integer division
    * (DuckDB `//` ≡ Scala `Long./` toward zero; empty clusters keep
    * their previous centroid) — then corpus assignment, 4-probe
    * selection, and candidate ranking. Deterministic training is what
    * makes an approximate TRAINED index hash-checkable at all. */
  // CTE-only form (the simLshChainCtes pattern) so sim_ivf_eval can
  // graft the brute-force truth and the hit join onto the same chain
  private lazy val simIvfChainCtes: String = {
    val rounds = (1 to 2).map { r =>
      s"""s$r AS (SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cv")} AS cs
         |  FROM e CROSS JOIN c${r - 1} c),
         |a$r AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rn
         |  FROM s$r) z WHERE rn = 1),
         |x$r AS (SELECT a.cid, t.i,
         |    sum(CAST(floor(CAST(e.embedding[t.i] AS DOUBLE) * 1048576) AS BIGINT)) AS s,
         |    count(*) AS n
         |  FROM e JOIN a$r a USING (vec_id) CROSS JOIN range(1, 65) t(i)
         |  GROUP BY a.cid, t.i),
         |c$r AS (SELECT cid, list(CAST(CAST(CAST(s AS BIGINT) // n AS DOUBLE) / 1048576 AS REAL) ORDER BY i) AS cv
         |    FROM x$r GROUP BY cid
         |  UNION ALL SELECT c.cid, c.cv FROM c${r - 1} c
         |    WHERE NOT EXISTS (SELECT 1 FROM x$r x WHERE x.cid = c.cid))""".stripMargin
    }.mkString(",\n")
    s"""e AS (SELECT vec_id, embedding FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, embedding AS cv FROM e WHERE vec_id < 16),
       |$rounds,
       |fs AS (SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cv")} AS cs
       |  FROM e CROSS JOIN c2 c),
       |corp AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rn
       |  FROM fs WHERE vec_id >= 5) z WHERE rn = 1)""".stripMargin
  }

  /** The probe/rank tail of the IVF chain at probe budget `p`, CTE
    * names suffixed so several budgets can coexist in one statement. */
  private def simIvfRankedCtes(p: Int, sfx: String): String =
    s"""prb$sfx AS (SELECT vec_id AS qid, cid FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rn
       |  FROM fs WHERE vec_id < 5) z WHERE rn <= $p),
       |sims$sfx AS (SELECT p.qid, a.vec_id,
       |    round(${cosSql("q.embedding", "v.embedding")}, 6) AS cos
       |  FROM prb$sfx p JOIN corp a ON p.cid = a.cid
       |  JOIN e q ON q.vec_id = p.qid JOIN e v ON v.vec_id = a.vec_id),
       |ranked$sfx AS (SELECT qid, vec_id, cos,
       |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
       |  FROM sims$sfx)""".stripMargin

  private lazy val simIvfTopKSql: String =
    s"""WITH $simIvfChainCtes,
       |${simIvfRankedCtes(4, "")}
       |SELECT qid, rnk AS "rank", vec_id, cos FROM ranked WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin

  /** Replay of SimilarityOps.ivfEval: the trained-IVF chain at the
    * default 4-probe budget, the brute-force truth, and the per-query
    * hit count in one statement (same graft as simAnnEvalSql). */
  private lazy val simIvfEvalSql: String =
    s"""WITH $simIvfChainCtes,
       |${simIvfRankedCtes(4, "")},
       |${recallGraftSql("e")}""".stripMargin

  /** Replay of SimilarityOps.ivfCurve: ONE trained chain, the ranked
    * tail instantiated per probe budget, one shared brute-force truth,
    * per-(budget, query) recall unioned. */
  private lazy val simIvfCurveSql: String = {
    val probes = Seq(1, 2, 4, 8, 16)
    val tails = probes.map(p => simIvfRankedCtes(p, s"_$p")).mkString(",\n")
    val recs = probes.map { p =>
      s"""atop_$p AS (SELECT qid, vec_id FROM ranked_$p WHERE rnk <= 5),
         |hits_$p AS (SELECT a.qid, CAST(count(*) AS BIGINT) AS n_hit
         |  FROM atop_$p a JOIN btop b ON a.qid = b.qid AND a.vec_id = b.vec_id
         |  GROUP BY a.qid),
         |rec_$p AS (SELECT CAST($p AS BIGINT) AS n_probe, qs.qid,
         |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         |  (CAST(coalesce(h.n_hit, 0) AS BIGINT) * 1000000) // 5 AS recall_micro
         |  FROM qs LEFT JOIN hits_$p h ON h.qid = qs.qid)""".stripMargin
    }.mkString(",\n")
    val union = probes.map(p => s"SELECT * FROM rec_$p").mkString("\n  UNION ALL ")
    s"""WITH $simIvfChainCtes,
       |$tails,
       |bq AS (SELECT vec_id AS qid, embedding AS qvec FROM e WHERE vec_id < 5),
       |bc AS (SELECT vec_id, embedding FROM e WHERE vec_id >= 5),
       |bsims AS (SELECT qid, bc.vec_id,
       |    round(${cosSql("qvec", "bc.embedding")}, 6) AS cos
       |  FROM bq, bc),
       |branked AS (SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
       |  FROM bsims),
       |btop AS (SELECT qid, vec_id FROM branked WHERE rnk <= 5),
       |qs AS (SELECT DISTINCT qid FROM btop),
       |$recs
       |SELECT * FROM ($union) u
       |ORDER BY n_probe, qid""".stripMargin
  }

  /** Full replay of the TRAINED PQ face (SimilarityOps.pqTopK): per
    * subspace (m=8, dsub=8, ksub=64), 2 unrolled Lloyd's rounds with
    * the same cosine-argmax assignment + fixed-point means as the IVF
    * oracle, then encode (per-subspace nearest code), reconstruct
    * (codebook concat in subspace order), ADC-score every candidate,
    * keep the rerank·k = 100 ADC survivors per query and re-rank them
    * with TRUE cosines (the standard ADC + exact-re-rank pipeline the
    * Spark face runs). */
  // CTE-only form (the simLshChainCtes pattern) so sim_pq_eval can
  // graft the brute-force truth and the hit join onto the same chain
  private lazy val simPqChainCtes: String = {
    val rounds = (1 to 2).map { r =>
      s"""p$r AS (SELECT s.vec_id, s.si, k.cid, ${cosSql("s.sv", "k.cv", 8)} AS cs
         |  FROM sub s JOIN k${r - 1} k ON s.si = k.si),
         |b$r AS (SELECT vec_id, si, cid FROM (SELECT vec_id, si, cid,
         |    row_number() OVER (PARTITION BY vec_id, si ORDER BY cs DESC, cid ASC) AS rn
         |  FROM p$r) z WHERE rn = 1),
         |y$r AS (SELECT b.si, b.cid, t.j,
         |    sum(CAST(floor(CAST(s.sv[t.j] AS DOUBLE) * 1048576) AS BIGINT)) AS s,
         |    count(*) AS n
         |  FROM sub s JOIN b$r b USING (vec_id, si) CROSS JOIN range(1, 9) t(j)
         |  GROUP BY b.si, b.cid, t.j),
         |k$r AS (SELECT si, cid, list(CAST(CAST(CAST(s AS BIGINT) // n AS DOUBLE) / 1048576 AS REAL) ORDER BY j) AS cv
         |    FROM y$r GROUP BY si, cid
         |  UNION ALL SELECT k.si, k.cid, k.cv FROM k${r - 1} k
         |    WHERE NOT EXISTS (SELECT 1 FROM y$r y WHERE y.si = k.si AND y.cid = k.cid))""".stripMargin
    }.mkString(",\n")
    s"""e AS (SELECT vec_id, embedding FROM embeddings),
       |sub AS (SELECT vec_id, t.si,
       |    list_transform(range(1, 9), j -> embedding[t.si * 8 + j]) AS sv
       |  FROM e CROSS JOIN range(0, 8) t(si)),
       |k0 AS (SELECT vec_id AS cid, si, sv AS cv FROM sub WHERE vec_id < 64),
       |$rounds,
       |pe AS (SELECT s.vec_id, s.si, k.cid, ${cosSql("s.sv", "k.cv", 8)} AS cs
       |  FROM sub s JOIN k2 k ON s.si = k.si WHERE s.vec_id >= 5),
       |enc AS (SELECT vec_id, si, cid FROM (SELECT vec_id, si, cid,
       |    row_number() OVER (PARTITION BY vec_id, si ORDER BY cs DESC, cid ASC) AS rn
       |  FROM pe) z WHERE rn = 1),
       |rec AS (SELECT n.vec_id, flatten(list(k.cv ORDER BY n.si)) AS rv
       |  FROM enc n JOIN k2 k ON k.si = n.si AND k.cid = n.cid
       |  GROUP BY n.vec_id),
       |adc AS (SELECT q.vec_id AS qid, r.vec_id,
       |    round(${cosSql("q.embedding", "r.rv")}, 6) AS adc
       |  FROM e q CROSS JOIN rec r WHERE q.vec_id < 5),
       |cnd AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY adc DESC, vec_id ASC) AS crn
       |  FROM adc) z WHERE crn <= 100),
       |sims AS (SELECT c.qid, c.vec_id,
       |    round(${cosSql("q.embedding", "v.embedding")}, 6) AS cos
       |  FROM cnd c JOIN e q ON q.vec_id = c.qid JOIN e v ON v.vec_id = c.vec_id),
       |ranked AS (SELECT qid, vec_id, cos,
       |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
       |  FROM sims)""".stripMargin
  }

  private lazy val simPqTopKSql: String =
    s"""WITH $simPqChainCtes
       |SELECT qid, rnk AS "rank", vec_id, cos FROM ranked WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin

  /** Replay of SimilarityOps.pqEval: the trained-PQ chain, the
    * brute-force truth, and the per-query hit count in one statement
    * (same graft as simAnnEvalSql). */
  private lazy val simPqEvalSql: String =
    s"""WITH $simPqChainCtes,
      |${recallGraftSql("e")}""".stripMargin

  /** The hyperplane matrix as a DuckDB nested-list literal — the
    * rpMatrixSql discipline: splitmix64-mixed components are computed
    * ONCE in Scala (SimilarityOps.planeComponent) and interpolated as
    * doubles (`Double.toString` round-trips exactly), so the oracle
    * holds bit-identical planes with no in-SQL generator replay. */
  private def lshPlaneMatrixSql(nPlanesTotal: Int): String =
    (0 until nPlanesTotal).map { p =>
      (0 until 64).map(j =>
        graft.ext.SimilarityOps.planeComponent(p, j).toString)
        .mkString("[", ", ", "]")
    }.mkString("[", ", ", "]")

  /** Full replication of the multi-table hyperplane-LSH near-dup join:
    * the planes are interpolated literals (lshPlaneMatrixSql), the
    * plane dots are in-order double folds (bit-identical to
    * list_sum(list_transform(...)) — the same contract the green
    * brute-force oracle relies on), so bucket membership, the candidate
    * set, and the verified cosines all reproduce exactly. */
  // Shared CTE chain for the embedding near-dup faces: LCG hyperplane
  // buckets per table, candidate equi-join, exact cosine verify.
  // Declared RECURSIVE so the cluster face can append the reachability
  // walk; the pair face simply doesn't use the recursion.
  private lazy val simNearDupCtes: String =
    s"""WITH RECURSIVE emb AS (SELECT vec_id, embedding FROM embeddings),
      |pm AS (SELECT ${lshPlaneMatrixSql(12)} AS m),
      |tp AS (SELECT t, p FROM generate_series(0, 1) g1(t)
      |       CROSS JOIN generate_series(0, 5) g2(p)),
      |dots AS (SELECT e.vec_id, tp.t, tp.p,
      |    list_sum(list_transform(range(1, 65),
      |      j -> CAST(e.embedding[j] AS DOUBLE) * pm.m[tp.t * 6 + tp.p + 1][j])) AS d
      |  FROM emb e CROSS JOIN tp, pm),
      |buck AS (SELECT vec_id, t,
      |    CAST(sum(CASE WHEN d > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
      |  FROM dots GROUP BY vec_id, t),
      |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      |  FROM buck a JOIN buck b
      |    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
      |v AS (SELECT vec_a, vec_b, round(
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(ea.embedding[i] AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(eb.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE))))), 6) AS cos
      |  FROM cand JOIN emb ea ON ea.vec_id = vec_a
      |            JOIN emb eb ON eb.vec_id = vec_b)""".stripMargin

  private val simNearDupsSql: String =
    s"""$simNearDupCtes
      |SELECT vec_a, vec_b, cos FROM v WHERE cos >= 0.3
      |ORDER BY vec_a, vec_b""".stripMargin

  // sim_knn_graph: both directions of every verified bucket-collision
  // pair, top-3 per vector by (cos DESC, nbr ASC) — the same chain, no
  // threshold, ranked instead of filtered.
  private lazy val simKnnGraphSql: String =
    s"""$simNearDupCtes,
      |sym AS (SELECT vec_a AS vec_id, vec_b AS nbr_id, cos FROM v
      |        UNION ALL SELECT vec_b, vec_a, cos FROM v),
      |rk AS (SELECT vec_id, nbr_id, cos,
      |    row_number() OVER (PARTITION BY vec_id
      |                       ORDER BY cos DESC, nbr_id ASC) AS "rank"
      |  FROM sym)
      |SELECT vec_id, "rank", nbr_id, cos FROM rk WHERE "rank" <= 3
      |ORDER BY vec_id, "rank"""".stripMargin

  // sim_decontaminate: same LCG buckets, but candidates are
  // train(label != 0) x holdout(label = 0) bucket collisions; exact
  // cosine verify, per-train-vector match count, flag.
  private lazy val simDecontaminateSql: String =
    s"""WITH emb AS (SELECT vec_id, label, embedding FROM embeddings),
      |pm AS (SELECT ${lshPlaneMatrixSql(12)} AS m),
      |tp AS (SELECT t, p FROM generate_series(0, 1) g1(t)
      |       CROSS JOIN generate_series(0, 5) g2(p)),
      |dots AS (SELECT e.vec_id, tp.t, tp.p,
      |    list_sum(list_transform(range(1, 65),
      |      j -> CAST(e.embedding[j] AS DOUBLE) * pm.m[tp.t * 6 + tp.p + 1][j])) AS d
      |  FROM emb e CROSS JOIN tp, pm),
      |buck AS (SELECT vec_id, t,
      |    CAST(sum(CASE WHEN d > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
      |  FROM dots GROUP BY vec_id, t),
      |cand AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS eval_id
      |  FROM buck a JOIN emb ta ON ta.vec_id = a.vec_id AND ta.label <> 0
      |       JOIN buck b ON a.t = b.t AND a.bucket = b.bucket
      |       JOIN emb tb ON tb.vec_id = b.vec_id AND tb.label = 0),
      |hits AS (SELECT cand.vec_id AS vec_id, CAST(count(*) AS BIGINT) AS n_matches
      |  FROM cand
      |  JOIN emb ea ON ea.vec_id = cand.vec_id
      |  JOIN emb eb ON eb.vec_id = cand.eval_id
      |  WHERE round(
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(ea.embedding[i] AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(eb.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE))))), 6)
      |    >= 0.3
      |  GROUP BY cand.vec_id)
      |SELECT e.vec_id, coalesce(h.n_matches, 0) AS n_matches,
      |       coalesce(h.n_matches, 0) > 0 AS contaminated
      |FROM emb e LEFT JOIN hits h ON h.vec_id = e.vec_id
      |WHERE e.label <> 0
      |ORDER BY e.vec_id""".stripMargin

  // sim_clusters: connected components over the verified near-dup pair
  // set — same recursive min-label reachability walk as dedup_clusters.
  private val simClustersSql: String =
    s"""$simNearDupCtes,
      |p AS (SELECT vec_a, vec_b FROM v WHERE cos >= 0.3),
      |edges AS (SELECT vec_a AS u, vec_b AS w FROM p
      |          UNION ALL SELECT vec_b, vec_a FROM p),
      |walk(u, label) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      |  UNION
      |  SELECT e.u, w2.label FROM edges e JOIN walk w2 ON e.w = w2.u
      |)
      |SELECT u AS vec_id, min(label) AS cluster,
      |       (u = min(label)) AS is_keeper
      |FROM walk GROUP BY u ORDER BY vec_id""".stripMargin

  // sim_semantic_keeper: the semantic-cluster walk (same chain as
  // sim_clusters) LEFT-joined onto the full quality-scored corpus —
  // singletons cluster to themselves; keeper = (quality DESC, doc_id
  // ASC) argmax per cluster, emitted as a per-document kept verdict.
  private val simSemanticKeeperSql: String =
    s"""$simNearDupCtes,
      |p AS (SELECT vec_a, vec_b FROM v WHERE cos >= 0.3),
      |edges AS (SELECT vec_a AS u, vec_b AS w FROM p
      |          UNION ALL SELECT vec_b, vec_a FROM p),
      |walk(u, label) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      |  UNION
      |  SELECT e.u, w2.label FROM edges e JOIN walk w2 ON e.w = w2.u
      |),
      |cl AS (SELECT u AS doc_id, min(label) AS cluster FROM walk GROUP BY u),
      |toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      |         FROM documents),
      |qx AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS nt,
      |        CAST(len(list_distinct(t)) AS DOUBLE) AS nd,
      |        CAST(len(list_filter(t, y -> y IN $stopSet)) AS DOUBLE) AS ns
      |      FROM toks),
      |q AS (SELECT doc_id,
      |        round(least(nt / 100.0, 1.0) * 0.4 + (nd / nt) * 0.4
      |              + (ns / nt) * 0.2, 6) AS quality
      |      FROM qx),
      |allx AS (SELECT q.doc_id, coalesce(cl.cluster, q.doc_id) AS cluster,
      |           q.quality
      |         FROM q LEFT JOIN cl USING (doc_id)),
      |rk AS (SELECT doc_id, cluster, quality,
      |         row_number() OVER (PARTITION BY cluster
      |                            ORDER BY quality DESC, doc_id ASC) AS rn
      |       FROM allx)
      |SELECT doc_id, cluster, quality, (rn = 1) AS kept
      |FROM rk ORDER BY doc_id""".stripMargin

  /** Replication of the query-directed multi-probe LSH top-k: 5 tables
    * × 9-plane buckets (interpolated splitmix64 planes, global plane
    * index t·9+p; 512 buckets/table sizes the corpus/bucket ratio for
    * recall at the test SFs); per (query, table) the candidate subsets
    * flip the 6 planes with smallest |dot| (ties by in-table plane
    * index — the same (|d|, p) struct sort the Spark side runs), and
    * the probe SEQUENCE ranks subsets by Σd² (ties by subset id — the
    * Spark side's (s, g, m) struct sort) and keeps the first 64 — the
    * full lattice at the measured recall knee for this corpus — so the
    * probed bucket SET is identical by construction. Candidates on
    * (table, bucket) equality, exact cosine ranking with the
    * (cos DESC, vec_id ASC) tie-break both engines share. */
  // CTE-only form so sim_ann_eval can graft the brute-force truth and
  // the hit join onto the same chain (the spanChainCtes pattern)
  private lazy val simLshChainCtes: String =
    s"""emb AS (SELECT vec_id, embedding FROM embeddings),
      |pm AS (SELECT ${lshPlaneMatrixSql(45)} AS m),
      |pl AS (SELECT p FROM generate_series(0, 44) g(p)),
      |dots AS (SELECT e.vec_id, pl.p,
      |    list_sum(list_transform(range(1, 65),
      |      j -> CAST(e.embedding[j] AS DOUBLE) * pm.m[pl.p + 1][j])) AS d
      |  FROM emb e CROSS JOIN pl, pm),
      |buck AS (SELECT vec_id, p // 9 AS tbl,
      |    CAST(sum(CASE WHEN d > 0 THEN 1 << (p % 9) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM dots GROUP BY vec_id, p // 9),
      |qd AS (SELECT vec_id, p // 9 AS tbl, p % 9 AS lp, d,
      |    row_number() OVER (PARTITION BY vec_id, p // 9
      |                       ORDER BY abs(d), p % 9) AS rn
      |  FROM dots WHERE vec_id < 5),
      |lowp AS (SELECT vec_id, tbl, list(lp ORDER BY rn) AS lps,
      |    list(d ORDER BY rn) AS ds
      |  FROM qd WHERE rn <= 6 GROUP BY vec_id, tbl),
      |gg AS (SELECT g FROM generate_series(0, 63) t(g)),
      |gsc AS (SELECT l.vec_id, l.tbl, gg.g,
      |    list_sum(list_transform(range(1, 7),
      |      i -> CASE WHEN (gg.g >> (i - 1)) & 1 = 1
      |                THEN l.ds[i] * l.ds[i] ELSE 0.0 END)) AS s,
      |    CAST(list_sum(list_transform(range(1, 7),
      |      i -> CASE WHEN (gg.g >> (i - 1)) & 1 = 1
      |                THEN 1 << l.lps[i] ELSE 0 END)) AS BIGINT) AS m
      |  FROM lowp l CROSS JOIN gg),
      |gsel AS (SELECT vec_id, tbl, m,
      |    row_number() OVER (PARTITION BY vec_id, tbl ORDER BY s, g) AS srn
      |  FROM gsc),
      |probes AS (SELECT q.vec_id AS qid, q.tbl, xor(q.bucket, g2.m) AS bucket
      |  FROM buck q JOIN gsel g2 ON g2.vec_id = q.vec_id AND g2.tbl = q.tbl
      |  WHERE q.vec_id < 5 AND g2.srn <= 64),
      |cand AS (SELECT DISTINCT p.qid, c.vec_id
      |  FROM probes p JOIN buck c ON p.tbl = c.tbl AND p.bucket = c.bucket
      |  WHERE c.vec_id >= 5),
      |sims AS (SELECT qid, cand.vec_id, round(
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(eq.embedding[i] AS DOUBLE) * CAST(ec.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(eq.embedding[i] AS DOUBLE) * CAST(eq.embedding[i] AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(ec.embedding[i] AS DOUBLE) * CAST(ec.embedding[i] AS DOUBLE))))), 6) AS cos
      |  FROM cand JOIN emb eq ON eq.vec_id = cand.qid
      |            JOIN emb ec ON ec.vec_id = cand.vec_id),
      |ranked AS (SELECT qid, vec_id, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
      |  FROM sims)""".stripMargin

  private val simLshTopKSql: String =
    s"""WITH $simLshChainCtes
      |SELECT qid, rnk AS "rank", vec_id, cos FROM ranked WHERE rnk <= 5
      |ORDER BY qid, rnk""".stripMargin

  /** Shared truth-graft block for the ANN eval oracles: brute-force
    * cosine truth over `embCte` (any CTE/table with vec_id +
    * embedding), hits against the chain's `ranked` top-5, per-query
    * recall in micros — ONE definition so the truth cosine and the
    * recall formula can never desynchronize across the eval family. */
  private def recallGraftSql(embCte: String): String =
    s"""atop AS (SELECT qid, vec_id FROM ranked WHERE rnk <= 5),
      |bq AS (SELECT vec_id AS qid, embedding AS qvec FROM $embCte WHERE vec_id < 5),
      |bc AS (SELECT vec_id, embedding FROM $embCte WHERE vec_id >= 5),
      |bsims AS (SELECT qid, bc.vec_id, round(
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(qvec[i] AS DOUBLE) * CAST(bc.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(qvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(bc.embedding[i] AS DOUBLE) * CAST(bc.embedding[i] AS DOUBLE))))), 6) AS cos
      |  FROM bq, bc),
      |branked AS (SELECT qid, vec_id,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
      |  FROM bsims),
      |btop AS (SELECT qid, vec_id FROM branked WHERE rnk <= 5),
      |hits AS (SELECT a.qid, CAST(count(*) AS BIGINT) AS n_hit
      |         FROM atop a JOIN btop b
      |           ON a.qid = b.qid AND a.vec_id = b.vec_id
      |         GROUP BY a.qid),
      |qs AS (SELECT DISTINCT qid FROM btop)
      |SELECT qs.qid, CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
      |  (CAST(coalesce(h.n_hit, 0) AS BIGINT) * 1000000) // 5 AS recall_micro
      |FROM qs LEFT JOIN hits h ON h.qid = qs.qid
      |ORDER BY qs.qid""".stripMargin

  /** Replay of SimilarityOps.annEval: the multi-probe LSH chain, the
    * brute-force truth, and the per-query hit count in one statement. */
  private lazy val simAnnEvalSql: String =
    s"""WITH $simLshChainCtes,
      |${recallGraftSql("emb")}""".stripMargin

  /** The JL projection matrix (SimilarityOps.rpComponent) as a DuckDB
    * nested-list literal — `Double.toString` round-trips (strtod is
    * correctly rounded), so both engines hold the identical 16×64
    * doubles. */
  private def rpMatrixSql(outDim: Int = 16): String =
    (0 until outDim).map { j =>
      (0 until 64).map(i => graft.ext.SimilarityOps.rpComponent(j, i).toString)
        .mkString("[", ", ", "]")
    }.mkString("[", ", ", "]")

  /** The `outDim`-dim sketch of `embedding` — same in-order fold and
    * 6-decimal component rounding as SimilarityOps.rpProject. */
  private def rpSketchExpr(outDim: Int): String =
    s"""list_transform(range(1, ${outDim + 1}), j ->
       |    round(list_sum(list_transform(range(1, 65),
       |      i -> CAST(embedding[i] AS DOUBLE) * mat[j][i])), 6))""".stripMargin

  /** Replay of SimilarityOps.rpReduceCsv — the sketch table serialized
    * as micro-unit CSV (components are pre-rounded to 6 decimals, so
    * ×10⁶ + round is an exact integer; long→string renders identically
    * cross-engine where raw double→string does not). */
  private val simRpReduceSql: String =
    s"""WITH m AS (SELECT ${rpMatrixSql()} AS mat)
       |SELECT vec_id, array_to_string(list_transform(${rpSketchExpr(16)},
       |    x -> CAST(round(x * 1000000) AS BIGINT)), ',') AS reduced
       |FROM embeddings, m ORDER BY vec_id""".stripMargin

  /** Full replay of the RP-sketch ANN (SimilarityOps.rpTopK): sketch
    * every vector, rank candidates per query by sketch cosine
    * (rpAnnDim dims, top rpAnnCandidates, vec_id tie-break), then
    * exact-re-rank the survivors with the 64-dim cosine. Deterministic
    * end to end, so unlike LSH this approximate index hash-checks. */
  // CTE-only form so sim_rp_eval can graft the brute-force truth onto
  // the same chain (the simLshChainCtes pattern)
  private lazy val simRpChainCtes: String = {
    val d = graft.ext.SimilarityOps.rpAnnDim
    val cand = graft.ext.SimilarityOps.rpAnnCandidates
    s"""m AS (SELECT ${rpMatrixSql(d)} AS mat),
       |e AS (SELECT vec_id, embedding, ${rpSketchExpr(d)} AS red
       |  FROM embeddings, m),
       |q AS (SELECT vec_id AS qid, embedding AS qvec, red AS qred
       |  FROM e WHERE vec_id < 5),
       |c AS (SELECT vec_id, embedding, red FROM e WHERE vec_id >= 5),
       |scored AS (SELECT qid, qvec, c.vec_id, c.embedding,
       |    round(${cosSql("qred", "red", d)}, 6) AS rcos
       |  FROM q CROSS JOIN c),
       |surv AS (SELECT qid, qvec, vec_id, embedding FROM (SELECT *,
       |    row_number() OVER (PARTITION BY qid ORDER BY rcos DESC, vec_id ASC) AS crank
       |  FROM scored) z WHERE crank <= $cand),
       |exact AS (SELECT qid, vec_id,
       |    round(${cosSql("qvec", "embedding")}, 6) AS cos FROM surv),
       |ranked AS (SELECT qid, vec_id, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
       |  FROM exact)""".stripMargin
  }

  private lazy val simRpTopKSql: String =
    s"""WITH $simRpChainCtes
       |SELECT qid, rnk AS "rank", vec_id, cos FROM ranked WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin

  /** Replay of SimilarityOps.rpEval: the JL-shortlist chain, the
    * brute-force truth, and the per-query hit count in one statement
    * (same graft as simAnnEvalSql / simPqEvalSql). */
  private lazy val simRpEvalSql: String =
    s"""WITH $simRpChainCtes,
       |${recallGraftSql("embeddings")}""".stripMargin

  /** Replay of SimilarityOps.int8QuantizeCsv: per-dimension exact
    * min/max (float→double values compare exactly), then the identical
    * IEEE expression tree — sub, mul-by-255, div, floor, clamp — per
    * component, serialized as a CSV string (array results are
    * unhashable in the driver's comparator). Degenerate dimensions
    * (max = min) code to 0. */
  // grid CTEs shared by the quantizer face and the int8 serving chain
  private lazy val simInt8GridCtes: String =
    """mm AS (SELECT i, min(CAST(embedding[i] AS DOUBLE)) AS mn,
      |         max(CAST(embedding[i] AS DOUBLE)) AS mx
      |       FROM embeddings, range(1, 65) t(i) GROUP BY i),
      |m AS (SELECT list(mn ORDER BY i) AS mins, list(mx ORDER BY i) AS maxs
      |      FROM mm)""".stripMargin

  private lazy val simInt8QuantSql: String =
    s"""WITH $simInt8GridCtes
      |SELECT vec_id, array_to_string(list_transform(range(1, 65), i ->
      |    CASE WHEN maxs[i] = mins[i] THEN CAST(0 AS BIGINT)
      |         ELSE CAST(least(floor((CAST(embedding[i] AS DOUBLE) - mins[i])
      |                 * 255.0 / (maxs[i] - mins[i])), 255.0) AS BIGINT)
      |    END), ',') AS codes
      |FROM embeddings, m ORDER BY vec_id""".stripMargin

  /** Replay of SimilarityOps.int8TopK: the same grid, the same codes,
    * the same per-query weight/offset folds (identical IEEE operand
    * order), ADC candidate pool of 20, exact cosine re-rank. */
  private lazy val simInt8ChainCtes: String =
    s"""$simInt8GridCtes,
      |corp AS (SELECT vec_id, embedding, list_transform(range(1, 65), i ->
      |    CASE WHEN maxs[i] = mins[i] THEN CAST(0 AS BIGINT)
      |         ELSE CAST(least(floor((CAST(embedding[i] AS DOUBLE) - mins[i])
      |                 * 255.0 / (maxs[i] - mins[i])), 255.0) AS BIGINT)
      |    END) AS codes
      |  FROM embeddings, m WHERE vec_id >= 5),
      |q AS (SELECT vec_id AS qid, embedding AS qv,
      |    list_transform(range(1, 65), i ->
      |      CAST(embedding[i] AS DOUBLE) * (maxs[i] - mins[i]) / 255.0) AS w,
      |    list_sum(list_transform(range(1, 65), i ->
      |      CAST(embedding[i] AS DOUBLE) * mins[i])) AS adc_offset
      |  FROM embeddings, m WHERE vec_id < 5),
      |ap AS (SELECT q.qid, c.vec_id, q.qv, c.embedding,
      |    q.adc_offset + list_sum(list_transform(range(1, 65), i ->
      |      CAST(c.codes[i] AS DOUBLE) * q.w[i])) AS approx
      |  FROM q, corp c),
      |cand AS (SELECT qid, vec_id, qv, embedding FROM (SELECT *,
      |    row_number() OVER (PARTITION BY qid
      |      ORDER BY approx DESC, vec_id ASC) AS crn
      |  FROM ap) z WHERE crn <= ${graft.ext.SimilarityOps.int8Rerank}),
      |sims AS (SELECT qid, vec_id, round(
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(qv[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))), 6) AS cos
      |  FROM cand),
      |ranked AS (SELECT qid, vec_id, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
      |  FROM sims)""".stripMargin

  private lazy val simInt8TopKSql: String =
    s"""WITH $simInt8ChainCtes
      |SELECT qid, rnk AS "rank", vec_id, cos FROM ranked WHERE rnk <= 5
      |ORDER BY qid, rnk""".stripMargin

  /** Replay of SimilarityOps.int8Eval (same graft as simAnnEvalSql;
    * the truth reads the raw table — identical rows to the chain's
    * q/corp split). */
  private lazy val simInt8EvalSql: String =
    s"""WITH $simInt8ChainCtes,
      |${recallGraftSql("embeddings")}""".stripMargin

  /** Fixed-point replay of SimilarityOps.labelCentroids: floor(v·2^20)
    * longs sum exactly in any order, then one int→double division —
    * bit-identical across engines with no ordered fold. */
  private val simLabelCentroidsSql: String =
    """SELECT label, i AS pos,
      |  CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT)) AS DOUBLE)
      |    / CAST(count(*) * 1048576 AS DOUBLE) AS centroid
      |FROM embeddings, range(1, 65) t(i)
      |GROUP BY label, i ORDER BY label, pos""".stripMargin

  /** Label-outlier replay: identical exact arithmetic — qv = ⌊v·2²⁰⌋,
    * n²·d² = Σ(qv·n − Σqv)² in DECIMAL(19,0)×DECIMAL(19,0) products
    * (38-digit width holds in both engines), presentation distance via
    * correctly-rounded sqrt + one division. */
  private val simLabelOutliersSql: String =
    """WITH q AS (SELECT vec_id, label, i AS pos,
      |             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS qv
      |           FROM embeddings, range(1, 65) t(i)),
      |m AS (SELECT label, pos, sum(qv) AS sq, count(*) AS n
      |      FROM q GROUP BY label, pos),
      |d AS (SELECT vec_id, label, n,
      |        sum(CAST(qv * n - sq AS DECIMAL(19,0)) *
      |            CAST(qv * n - sq AS DECIMAL(19,0))) AS n2d2
      |      FROM q JOIN m USING (label, pos) GROUP BY vec_id, label, n),
      |r AS (SELECT label, vec_id, n, n2d2,
      |        row_number() OVER (PARTITION BY label ORDER BY n2d2 DESC, vec_id) AS rank
      |      FROM d)
      |SELECT label, rank, vec_id,
      |  round(sqrt(CAST(n2d2 AS DOUBLE)) / (CAST(n AS DOUBLE) * 1048576.0), 6) AS dist
      |FROM r WHERE rank <= 3 ORDER BY label, rank""".stripMargin

  /** Shard-balance replay: the global LPT rank is a plain ROW_NUMBER
    * under the same total order (n_chars desc, doc_id). */
  private val sampShardsSql: String =
    s"""WITH r AS (SELECT doc_id, n_chars,
       |             row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn
       |           FROM documents)
       |SELECT (rn - 1) % ${SampleOps.shardCount} AS shard,
       |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  round(CAST(sum(n_chars) AS DOUBLE) /
       |        SUM(CAST(sum(n_chars) AS DOUBLE)) OVER (), 6) AS share
       |FROM r GROUP BY 1 ORDER BY shard""".stripMargin

  private val simEmbeddingStatsSql: String =
    """SELECT vec_id, label,
      |  round(sqrt(list_sum(list_transform(range(1, 65),
      |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))), 6) AS norm,
      |  CAST(len(embedding) AS BIGINT) AS dim
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // Planted image fixtures (ext.MultimodalOps.Fixtures): byte lengths
  // and checksums interpolate from the actual fixture bytes; the
  // DIMENSIONS are hand-asserted literals — if the Spark-side header
  // parser misreads a PNG IHDR or JPEG SOF, the hash check fails.
  private def mmFix = graft.ext.MultimodalOps.Fixtures
  private def mmMd5(b: Array[Byte]): String = mmFix.md5hex(b)
  private def mmSynthW(len: Int): Long = 64L + len % 640L
  private def mmSynthH(len: Int): Long = 64L + (len * 7L) % 480L

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

  // ==========================================================================
  // Event-time [EXT] oracle SQL
  // ==========================================================================

  private val evTumblingSql: String =
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events)
      |SELECT (epoch_us(ts) // 600000000) * 600 AS bucket_start, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val evSlidingSql: String =
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      |x AS (SELECT value, ((epoch_us(ts) // 300000000) - k) * 300 AS bucket_start
      |      FROM e, (VALUES (0), (1)) t(k))
      |SELECT bucket_start, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value
      |FROM x GROUP BY 1 ORDER BY 1""".stripMargin

  private val evSessionizeSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
      |           FROM events),
      |g AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
      |                       OR us - lag(us) OVER w > 300000000
      |                     THEN 1 ELSE 0 END AS ns
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |      FROM g)
      |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |  min(us) // 1000000 AS session_start, max(us) // 1000000 AS session_end,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val evAsofSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |                  epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |           FROM events WHERE event_type IN ('view', 'purchase')),
      |w AS (SELECT *, max(CASE WHEN event_type = 'view' THEN us END) OVER
      |        (PARTITION BY user_id ORDER BY us, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_us
      |      FROM e)
      |SELECT event_id, user_id, us // 1000000 AS purchase_epoch,
      |       last_view_us // 1000000 AS last_view_epoch
      |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  private val evRangeClicksSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |           FROM events)
      |SELECT err.event_id, err.user_id,
      |  CAST(count(c.ts) FILTER (WHERE c.ts >= err.ts - INTERVAL 5 MINUTE
      |                             AND c.ts < err.ts) AS BIGINT) AS n_clicks_before
      |FROM (SELECT * FROM e WHERE event_type = 'error') err
      |LEFT JOIN (SELECT user_id, ts FROM e WHERE event_type = 'click') c
      |  ON c.user_id = err.user_id
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  private val textTopTermsSql: String = {
    s"""WITH tok AS (SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS token
       |            FROM documents),
       |cnt AS (SELECT lang, token, count(*) AS n FROM tok
       |        WHERE token NOT IN $stopSet AND length(token) > 0
       |        GROUP BY lang, token),
       |rk AS (SELECT lang, token, n,
       |         row_number() OVER (PARTITION BY lang ORDER BY n DESC, token ASC) AS rnk
       |       FROM cnt)
       |SELECT lang, rnk, token, n FROM rk WHERE rnk <= 5
       |ORDER BY lang, rnk""".stripMargin
  }

  private val evFunnelSql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |           FROM events),
      |v AS (SELECT user_id, min(us) AS v_us FROM e WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(us) AS c_us FROM e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND us > v_us GROUP BY 1),
      |p AS (SELECT e.user_id, min(us) AS p_us FROM e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND us > c_us GROUP BY 1)
      |SELECT stage, n_users FROM (
      |  SELECT '1_view' AS stage, count(*) AS n_users FROM v
      |  UNION ALL SELECT '2_click', count(*) FROM c
      |  UNION ALL SELECT '3_purchase', count(*) FROM p
      |) ORDER BY stage""".stripMargin

  private val evPropsStatsSql: String =
    """SELECT event_type,
      |  count(CAST(props->>'k' AS BIGINT)) AS n,
      |  CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(props->>'k' AS BIGINT)) AS min_k,
      |  max(CAST(props->>'k' AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

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
    // TPC-H Q7/Q8 shapes: two-nation shipping volume and exact-integer
    // regional market share — the dims all broadcast, one fact shuffle
    "q_volume_shipping" -> ((s, d) => Relational.volumeShipping(s, d)),
    "q_market_share" -> ((s, d) => Relational.marketShare(s, d)),
    // Q13 shape: count-of-counts over an outer join (zero-order
    // customers included); Q18 shape: HAVING-qualified big orders
    "q_custdist" -> ((s, d) => Relational.custDist(s, d)),
    "q_big_orders" -> ((s, d) => Relational.bigOrders(s, d)),
    // per-join-key skew planning table (max share / skew factor, exact)
    "q_skew_report" -> ((s, d) => graft.operators.StatsOps.skewReport(s, d)),
    "q3_top_revenue_orders" -> ((s, d) => Relational.topRevenueOrders(s, d)),
    "q_revenue_by_brand" -> ((s, d) => Relational.revenueByBrand(s, d)),
    "q_semi_join" -> ((s, d) => Relational.customersWithBigOrders(s, d)),
    "q_anti_join" -> ((s, d) => Relational.customersWithoutOrders(s, d)),
    "q_rollup" -> ((s, d) => Relational.rollupSummary(s, d)),
    "q_cube" -> ((s, d) => Relational.cubeSummary(s, d)),
    "q_grouping_sets" -> ((s, d) => Relational.groupingSetsSummary(s, d)),
    "q_monthly_revenue" -> ((s, d) => Relational.monthlyRevenue(s, d)),
    "q_sql_exists" -> ((s, d) => Relational.sqlExistsQuery(s, d)),
    "q_topk_per_group" -> ((s, d) => Relational.topOrdersPerSegment(s, d)),
    "q_window_running" -> ((s, d) => Relational.runningRevenuePerCustomer(s, d)),
    "q_window_lag" -> ((s, d) => Relational.orderGaps(s, d)),
    "q_min_by" -> ((s, d) => Relational.oldestOrderPerCustomer(s, d)),
    "q_set_ops" -> ((s, d) => Relational.segmentSetOps(s, d)),
    "q_percentiles" -> ((s, d) => Relational.exactPercentiles(s, d)),
    "q_sketches" -> ((s, d) => Relational.hllNdv(s, d)),
    "q_salted_agg" -> (qSaltedAgg _),
    "q_salted_join" -> (qSaltedJoin _),
    "ev_session_window" -> ((s, d) => EventOps.sessionWindowStats(s, d)),
    "q_outer_left" -> ((s, d) => Relational.customerOrderSummary(s, d)),
    "q_outer_full" -> ((s, d) => Relational.nationBalanceFullOuter(s, d)),
    "q_pivot" -> ((s, d) => Relational.statusPriorityPivot(s, d)),
    "q_ntile" -> ((s, d) => Relational.balanceQuartiles(s, d)),
    "q_corr_scalar" -> ((s, d) => Relational.maxPricedLineitems(s, d)),
    "q_min_cost_supplier" -> ((s, d) => Relational.minCostSupplier(s, d)),
    "q_sole_blame" -> ((s, d) => Relational.soleBlameSuppliers(s, d)),
    "q_small_qty_revenue" -> ((s, d) => Relational.smallQtyRevenue(s, d)),
    "q_cust_sales_opp" -> ((s, d) => Relational.custSalesOpp(s, d)),
    "q_priority_wait" -> ((s, d) => Relational.priorityWait(s, d)),
    "q_important_parts" -> ((s, d) => Relational.importantParts(s, d)),
    "q_supplier_diversity" -> ((s, d) => Relational.supplierDiversity(s, d)),
    "q_discount_revenue" -> ((s, d) => Relational.discountRevenue(s, d)),
    "q_profit_by_nation" -> ((s, d) => Relational.profitByNation(s, d)),
    "q_returned_customers" -> ((s, d) => Relational.returnedCustomers(s, d)),
    "q_late_priority_mix" -> ((s, d) => Relational.latePriorityMix(s, d)),
    "q_promo_share" -> ((s, d) => Relational.promoShare(s, d)),
    "q_top_supplier" -> ((s, d) => Relational.topSupplier(s, d)),
    "q_dominant_supplier" -> ((s, d) => Relational.dominantSupplier(s, d)),
    "q_special_revenue" -> ((s, d) => Relational.specialRevenue(s, d)),
    "q_quarterly" -> ((s, d) => Relational.quarterlyRevenue(s, d)),
    "q_string_funcs" -> ((s, d) => Relational.partTypeStats(s, d)),
    "q_array_agg" -> ((s, d) => Relational.orderKeyArraysCsv(s, d)),
    "cp_hashes" -> (cpHashes _),
    "cp_readable_date" -> (cpReadableDate _),
    "cp_times_agg" -> (cpTimesAgg _),
    "ev_user_stats" -> (evUserStats _),
    // LLM-data ops [EXT]
    "text_stats" -> ((s, d) => TextOps.textStats(s, d)),
    "text_quality" -> ((s, d) => TextOps.qualityScore(s, d)),
    // trained quality/language filter (micro-quantized logistic GD)
    "text_quality_lr" -> ((s, d) => TextOps.qualityLrScores(s, d)),
    // serving-path faces (r12 judge #6 discipline): score the corpus
    // THROUGH the persisted model artifacts the streams serve from —
    // the artifact round-trip joins the driver gate, not just a spec
    "text_lr_served" -> ((s, d) => graft.streaming.ScoreStream.servedScores(s, d)),
    "text_dsir_served" -> ((s, d) => graft.streaming.DsirStream.servedScores(s, d)),
    "text_quality_lr_weights" -> ((s, d) => TextOps.qualityLrWeights(s, d)),
    "text_corpus_card" -> ((s, d) => TextOps.corpusCard(s, d)),
    "text_collocations" -> ((s, d) => TextOps.collocations(s, d)),
    "text_dsir" -> ((s, d) => TextOps.dsirScores(s, d)),
    "text_dsir_mix" -> ((s, d) => TextOps.dsirMix(s, d)),
    "samp_dsir" -> ((s, d) => SampleOps.dsirResample(s, d)),
    "text_pretrain_corpus" -> ((s, d) => TextOps.pretrainCorpus(s, d)),
    "text_langid" -> ((s, d) => TextOps.langId(s, d)),
    "text_fingerprint" -> ((s, d) => TextOps.fingerprints(s, d)),
    "text_topterms" -> ((s, d) => TextOps.topTerms(s, d)),
    "text_repetition" -> ((s, d) => TextOps.repetitionSignals(s, d)),
    "text_sample" -> ((s, d) => SampleOps.mixtureSample(s, d)),
    "text_pack" -> ((s, d) => SampleOps.packSequences(s, d)),
    "text_chunks" -> ((s, d) => TextOps.chunkDocuments(s, d)),
    // CCNet-style repeated-passage removal over non-overlapping chunks
    "text_boilerplate" -> ((s, d) => TextOps.boilerplateScrub(s, d)),
    // per-source chi-squared token-distribution drift (log-free)
    "text_drift" -> ((s, d) => TextOps.sourceDrift(s, d)),
    "text_novelty" -> ((s, d) => TextOps.noveltyScores(s, d)),
    "text_lm_score" -> ((s, d) => TextOps.lmScore(s, d)),
    // tokenizer-aware curation: corpus digraph stats and real BPE
    // training (first 3 merges, driver-paced vocab-sized rounds)
    "text_bpe_pairs" -> ((s, d) => TextOps.bpePairs(s, d)),
    "text_bpe_merges" -> ((s, d) => TextOps.bpeMerges(s, d)),
    "text_bpe_fertility" -> ((s, d) => TextOps.bpeFertility(s, d)),
    "text_bpe_tokens" -> ((s, d) => TextOps.bpeTokensPerDoc(s, d)),
    "text_bpe_curve" -> ((s, d) => TextOps.bpeCurve(s, d)),
    "text_vocab_coverage" -> ((s, d) => TextOps.vocabCoverage(s, d)),
    "q_pii_scrub" -> ((s, d) => TextOps.scrubIds(s, d)),
    "q_mode_median" -> ((s, d) => Relational.segmentModeMedian(s, d)),
    "q_unpivot" -> ((s, d) => Relational.partMeasuresLong(s, d)),
    "ev_funnel" -> ((s, d) => EventOps.funnel(s, d)),
    "dedup_exact" -> ((s, d) => DedupOps.exactDupGroups(s, d)),
    "dedup_incremental" -> ((s, d) => DedupOps.incrementalDedup(s, d)),
    "dedup_incremental_near" -> ((s, d) => DedupOps.incrementalNearDedup(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => DedupOps.ngramJaccardPairs(s, d)),
    "dedup_clusters" -> ((s, d) => DedupOps.dedupClusters(s, d)),
    "dedup_minhash_lsh" -> ((s, d) => DedupOps.minhashLshPairs(s, d, md5Mode = true)),
    "dedup_lsh_eval" -> ((s, d) => DedupOps.lshEval(s, d)),
    "dedup_simhash" -> ((s, d) => DedupOps.simhashPairs(s, d, md5Mode = true)),
    "sim_bruteforce_topk" -> ((s, d) => SimilarityOps.bruteForceTopK(s, d)),
    "sim_mmr" -> ((s, d) => SimilarityOps.mmrSelect(s, d)),
    "sim_dim_curve" -> ((s, d) => SimilarityOps.dimCurve(s, d)),
    "sim_lsh_topk" -> ((s, d) => SimilarityOps.lshTopK(s, d)),
    "sim_ann_eval" -> ((s, d) => SimilarityOps.annEval(s, d)),
    "sim_ivf_topk" -> ((s, d) => SimilarityOps.ivfTopK(s, d)),
    // full probe (nProbe = nCentroids) makes IVF provably exact: every
    // posting list is scanned, so the result must equal brute force —
    // the recall knob checked at its endpoint by the brute-force oracle
    "sim_ivf_fullprobe" -> ((s, d) => SimilarityOps.ivfTopK(s, d, nCentroids = 16, nProbe = 16)),
    // recall@5 of the DEFAULT 4-probe serving budget vs brute force —
    // the eval-family member fullprobe can't be (it is exact)
    "sim_ivf_eval" -> ((s, d) => SimilarityOps.ivfEval(s, d)),
    // recall per probe budget (1..16 of 16) — the serving-cost curve;
    // the 16-probe rows anchor at exactly 10^6 (full probe ≡ truth)
    "sim_ivf_curve" -> ((s, d) => SimilarityOps.ivfCurve(s, d)),
    // the PERSISTED index on its serving path: build the parquet
    // artifact once per session, query with literal-cid partition
    // pruning; identical training ⇒ row-identical to sim_ivf_topk, so
    // the trained-replay oracle hash-checks the pruned artifact path
    "sim_ivf_served" -> ((s, d) => SimilarityOps.ivfServedTopK(s, d)),
    // JL random-projection sketch family: the reduced-vector artifact
    // and the sketch-filter/exact-verify ANN built on it — fully
    // deterministic. The artifact face registers CSV-serialized (raw
    // array columns are unhashable in the driver's pandas comparator —
    // the orderKeyArraysCsv precedent); the typed array stays pinned by
    // RpSketchSpec.
    "sim_rp_reduce" -> ((s, d) => SimilarityOps.rpReduceCsv(s, d)),
    "sim_rp_topk" -> ((s, d) => SimilarityOps.rpTopK(s, d)),
    "sim_rp_eval" -> ((s, d) => SimilarityOps.rpEval(s, d)),
    // the persisted sketch artifact on its serving path (the candidate
    // scan never reads the wide embedding column); ≡ sim_rp_topk
    "sim_rp_served" -> ((s, d) => SimilarityOps.rpServedTopK(s, d)),
    // int8 scalar quantization: per-dim [min,max] grid, 4× compression
    // (CSV-serialized codes for the gate; typed face in SimilaritySpec)
    "sim_int8_quant" -> ((s, d) => SimilarityOps.int8QuantizeCsv(s, d)),
    "sim_int8_topk" -> ((s, d) => SimilarityOps.int8TopK(s, d)),
    "sim_int8_eval" -> ((s, d) => SimilarityOps.int8Eval(s, d)),
    "sim_near_dups" -> ((s, d) => SimilarityOps.embeddingNearDups(s, d)),
    // corpus-wide kNN graph over the banded candidates, per-vector
    // top-3 on the native bounded-heap exec (SemDeDup's input table)
    "sim_knn_graph" -> ((s, d) => SimilarityOps.knnGraph(s, d)),
    "sim_clusters" -> ((s, d) => SimilarityOps.semanticClusters(s, d)),
    "sim_semantic_keeper" -> ((s, d) => SimilarityOps.semanticKeeper(s, d)),
    "sim_decontaminate" -> ((s, d) => SimilarityOps.semanticDecontaminate(s, d)),
    "sim_embedding_stats" -> ((s, d) => SimilarityOps.embeddingStats(s, d)),
    "sim_label_centroids" -> ((s, d) => SimilarityOps.labelCentroids(s, d)),
    "sim_label_outliers" -> ((s, d) => SimilarityOps.labelOutliers(s, d)),
    "samp_shards" -> ((s, d) => SampleOps.shardAssignment(s, d)),
    "mm_media_meta" -> ((s, d) => MultimodalOps.mediaMeta(s, d)),
    "mm_audio_meta" -> ((s, d) => MultimodalOps.audioMeta(s, d)),
    "mm_resize" -> ((s, d) => MultimodalOps.resize(s, d)),
    "mm_frames" -> ((s, d) => MultimodalOps.sampleFrames(s, d)),
    // cross-media duplicate frames (the video near-dup primitive)
    "mm_frame_dedup" -> ((s, d) => MultimodalOps.frameDedup(s, d)),
    // the file-granularity landing zone: binaryFile source → decode
    "mm_binary_ingest" -> ((s, d) => MultimodalOps.binaryIngest(s, d)),
    // incremental-pipeline bookkeeping: snapshot diff summary
    "q_corpus_diff" -> ((s, d) => Relational.corpusDiff(s, d)),
    // event-time [EXT]
    "ev_tumbling" -> ((s, d) => EventOps.tumblingCounts(s, d)),
    "ev_sliding" -> ((s, d) => EventOps.slidingCounts(s, d)),
    "ev_sessionize" -> ((s, d) => EventOps.sessionize(s, d)),
    "ev_asof" -> ((s, d) => EventOps.lastViewBeforePurchase(s, d)),
    "ev_range_clicks" -> ((s, d) => EventOps.clicksBeforeErrors(s, d)),
    "ev_props_stats" -> ((s, d) => EventOps.propsStats(s, d)),

    "q_compact_latest" -> ((s, d) => ChangeOps.latestEvents(s, d)),
    "q_scd2" -> ((s, d) => ChangeOps.orderStatusHistory(s, d)),
    "q_heavy_hitters" -> ((s, d) => graft.operators.SkewOps.hotUsers(s, d)),
    "q_bloom_join" -> ((s, d) => graft.operators.BloomOps.highValueOrderRevenue(s, d)),
    "text_tfidf" -> ((s, d) => TextOps.tfIdfTopTerms(s, d)),
    "q_zorder" -> ((s, d) => graft.sources.LayoutOps.zOrderBuckets(s, d)),
    "q_upsert" -> ((s, d) => ChangeOps.correctedOrders(s, d)),
    "dedup_decontaminate" -> ((s, d) => DedupOps.decontaminate(s, d)),
    "q_table_stats" -> ((s, d) => graft.operators.StatsOps.orderStats(s, d)),
    "sim_pq_topk" -> ((s, d) => SimilarityOps.pqTopK(s, d)),
    "sim_pq_eval" -> ((s, d) => SimilarityOps.pqEval(s, d)),
    "sim_pq_exact" -> ((s, d) => SimilarityOps.pqExact(s, d)),
    "q_pagerank" -> ((s, d) => graft.operators.GraphOps.pageRank(s, d)),
    "q_topk_native" -> ((s, d) => Relational.topOrdersPerSegmentNative(s, d)),
    "dedup_keeper_quality" -> ((s, d) => DedupOps.keeperByQuality(s, d)),
    "dedup_weights" -> ((s, d) => DedupOps.keeperWeights(s, d)),
    "dedup_curated" -> ((s, d) => DedupOps.curatedCorpus(s, d)),
    "q_cms" -> ((s, d) => graft.operators.SketchOps.cmsFrequency(s, d)),
    "q_triangles" -> ((s, d) => graft.operators.GraphOps.triangleCount(s, d)),
    "text_inverted" -> ((s, d) => TextOps.invertedIndex(s, d)),
    "samp_quota" -> ((s, d) => SampleOps.quotaByLang(s, d)),
    "ev_ewma" -> ((s, d) => EventOps.ewmaFeatures(s, d)),
    "q_kcore" -> ((s, d) => graft.operators.GraphOps.kCorePeel(s, d)),
    "q_triangles_approx" -> ((s, d) => graft.operators.GraphOps.triangleEstimate(s, d)),
    "q_quantile_sketch" -> ((s, d) => graft.operators.SketchOps.bottomKQuantiles(s, d)),
    "samp_split" -> ((s, d) => SampleOps.corpusSplit(s, d)),
    // split keyed by near-dup cluster: no train/test straddle possible
    "samp_split_leakfree" -> ((s, d) => SampleOps.leakFreeSplit(s, d)),
    // per-source token budgets in seeded-hash priority order
    "samp_token_budget" -> ((s, d) => SampleOps.tokenBudgetMix(s, d)),
    // capstone: keepers ∩ leak-free train split → budget fill
    "samp_training_mix" -> ((s, d) => SampleOps.trainingMix(s, d)),
    "q_window_range_frame" -> ((s, d) => Relational.trailingSpend(s, d)),
    "q_kmv_distinct" -> ((s, d) => graft.operators.SketchOps.kmvDistinct(s, d)),
    "q_skyline" -> ((s, d) => Relational.skylineParts(s, d)),
    "q_labelprop" -> ((s, d) => graft.operators.GraphOps.labelPropagation(s, d)),
    "samp_pps" -> ((s, d) => SampleOps.ppsSample(s, d)),
    "ev_rolling_distinct" -> ((s, d) => EventOps.rollingDistinctUsers(s, d)),
    "q_histogram" -> ((s, d) => graft.operators.StatsOps.priceHistograms(s, d)),
    "q_asof_native" -> ((s, d) => EventOps.lastViewBeforePurchaseNative(s, d)),
    "q_dq_report" -> ((s, d) => graft.operators.StatsOps.dqReport(s, d)),
    "q_asof_forward" -> ((s, d) => EventOps.nextViewAfterPurchase(s, d)),
    "ev_gapfill" -> ((s, d) => EventOps.gapFill(s, d)),
    "q_fuzzy_join" -> ((s, d) => graft.ext.DedupOps.editDistanceNeighbors(s, d)),
    "q_compaction_plan" -> ((s, d) => graft.sources.LayoutOps.compactionPlan(s, d)),
    "q_outliers_mad" -> ((s, d) => graft.operators.StatsOps.madOutliers(s, d)),
    "q_bfs" -> ((s, d) => graft.operators.GraphOps.bfsHops(s, d)),
    "ev_retention" -> ((s, d) => EventOps.cohortRetention(s, d)),
    "ev_markov" -> ((s, d) => EventOps.eventTransitions(s, d)),
    "q_assoc_rules" -> ((s, d) => graft.operators.BasketOps.associationRules(s, d)),
    "ev_interval_overlap" -> ((s, d) => EventOps.intervalOverlap(s, d)),
    "q_sssp" -> ((s, d) => graft.operators.GraphOps.ssspCosts(s, d)),
    "ev_rfm" -> ((s, d) => EventOps.rfmScores(s, d)),
    "q_linreg" -> ((s, d) => graft.operators.StatsOps.linregByBrand(s, d)),
    "dedup_passages" -> ((s, d) => graft.ext.DedupOps.passageDuplication(s, d)),
    "dedup_spans" -> ((s, d) => graft.ext.DedupOps.duplicatedSpans(s, d)),
    "samp_temperature" -> ((s, d) => graft.ext.SampleOps.temperatureSample(s, d)),
    "ev_attribution" -> ((s, d) => EventOps.attribution(s, d)),
    "ev_conversion_lag" -> ((s, d) => EventOps.conversionLag(s, d)),
    "ev_anomaly" -> ((s, d) => EventOps.hourlyAnomalies(s, d)),
    "ev_cusum" -> ((s, d) => EventOps.cusumShift(s, d)),
    // the streamed-maintenance serving path: three hash-chunk batches
    // replayed through CusumStream.applyBatch once per session, the
    // statistic read from the committed view — batch ≡ streamed is part
    // of the driver gate, not just a spec (r12 judge #6)
    "ev_cusum_served" -> ((s, d) => graft.streaming.CusumStream.servedStatistic(s, d)),
    "ev_cusum_alerts" -> ((s, d) => graft.streaming.CusumStream.servedAlerts(s, d)),
    // the incremental-view maintainer's protocol under a chunked replay
    "ev_view_served" -> ((s, d) => graft.streaming.IncrementalAgg.servedView(s, d)),
    "ev_seasonality" -> ((s, d) => EventOps.seasonality(s, d)),
    "ev_weekend_chi2" -> ((s, d) => EventOps.weekendChi2(s, d)),
    "q_price_bands" -> ((s, d) => graft.operators.StatsOps.monthlyPriceBands(s, d)),
    "q_asof_tolerance" -> ((s, d) => EventOps.lastViewWithin(s, d)),
    "ev_trigrams" -> ((s, d) => EventOps.eventTrigrams(s, d)),
    "q_ship_latency" -> ((s, d) => graft.operators.StatsOps.shipLatency(s, d)),
    "ev_concentration" -> ((s, d) => EventOps.concentrationDeciles(s, d)),
    "q_degree_dist" -> ((s, d) => graft.operators.GraphOps.degreeDistribution(s, d)),
    "q_half_coverage" -> ((s, d) => Relational.halfCoverage(s, d))
  )

  /** Fixed-point PageRank, 3 rounds unrolled from one template — the
    * same integer arithmetic GraphOps.pageRank runs (scale 1e12,
    * damping 85/100, truncating division ⇒ bit-identical ranks). */
  private val qPageRankSql: String = {
    val rounds = (1 to 3).map { i =>
      s"""c$i AS (SELECT e.dst, sum(r.r // e.deg) AS in_sum
         |  FROM r${i - 1} r JOIN edges e ON r.node = e.src GROUP BY 1),
         |r$i AS (SELECT node,
         |    CAST((SELECT (15 * 1000000000000) // (100 * n) FROM nn)
         |      + (85 * coalesce(c$i.in_sum, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes LEFT JOIN c$i ON node = c$i.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_partkey * 2 AS p, l_suppkey * 2 + 1 AS s
       |            FROM lineitem),
       |e0 AS (SELECT s AS src, p AS dst FROM li
       |       UNION ALL SELECT p, s FROM li),
       |deg AS (SELECT src, count(*) AS deg FROM e0 GROUP BY 1),
       |edges AS (SELECT e0.src, e0.dst, deg.deg FROM e0 JOIN deg USING (src)),
       |nodes AS (SELECT DISTINCT src AS node FROM e0),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT node, (SELECT 1000000000000 // n FROM nn) AS r FROM nodes),
       |$rounds
       |SELECT node, r FROM r3 ORDER BY node""".stripMargin
  }

  /** Capstone curation oracle: quality gate + quality-keeper dedup +
    * 5-gram decontamination, composed from the same CTE chains the
    * individual oracles use. */
  private val dedupCuratedSql: String =
    s"""$dedupClusterCtes,
      |cl AS (SELECT u AS doc_id, min(label) AS cluster FROM walk GROUP BY u),
      |qx AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS nt,
      |        CAST(len(list_distinct(t)) AS DOUBLE) AS nd,
      |        CAST(len(list_filter(t, y -> y IN $stopSet)) AS DOUBLE) AS ns
      |      FROM toks),
      |q AS (SELECT doc_id,
      |        round(least(nt / 100.0, 1.0) * 0.4 + (nd / nt) * 0.4
      |              + (ns / nt) * 0.2, 6) AS quality
      |      FROM qx),
      |keepq AS (SELECT doc_id, quality FROM q WHERE quality >= 0.3),
      |krk AS (SELECT cluster, doc_id,
      |          row_number() OVER (PARTITION BY cluster
      |                             ORDER BY quality DESC, doc_id ASC) AS rn
      |        FROM cl JOIN q USING (doc_id)),
      |duplosers AS (SELECT doc_id FROM krk WHERE rn > 1),
      |toks5 AS (SELECT doc_id, source,
      |                 string_split_regex(trim(text), '\\s+') AS t
      |          FROM documents),
      |sh5 AS (SELECT doc_id, source, list_distinct(list_transform(
      |          range(0, greatest(len(t) - 5, 0) + 1),
      |          i -> array_to_string(list_slice(t, i + 1, i + 5), ' '))) AS s
      |        FROM toks5),
      |eg AS (SELECT DISTINCT unnest(s) AS gram FROM sh5 WHERE source = 'src0'),
      |tg AS (SELECT doc_id, unnest(s) AS gram FROM sh5 WHERE source <> 'src0'),
      |contam AS (SELECT DISTINCT tg.doc_id FROM tg
      |           JOIN eg USING (gram) WHERE length(gram) > 0)
      |SELECT d.doc_id, d.lang, keepq.quality
      |FROM documents d JOIN keepq USING (doc_id)
      |WHERE d.source <> 'src0'
      |  AND d.doc_id NOT IN (SELECT doc_id FROM duplosers)
      |  AND d.doc_id NOT IN (SELECT doc_id FROM contam)
      |ORDER BY d.doc_id""".stripMargin

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
    "q_volume_shipping" -> qVolumeShippingSql,
    "q_market_share" -> qMarketShareSql,
    "q_skew_report" -> qSkewReportSql,
    "q_custdist" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q_big_orders" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
        |  CAST(total_qty AS DOUBLE) AS total_qty
        |FROM (SELECT l_orderkey,
        |        sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150.0) q
        |JOIN orders ON o_orderkey = q.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "q3_top_revenue_orders" -> q3TopRevenueOrdersSql,
    "q_revenue_by_brand" -> qBrandSql,
    "q_semi_join" -> qSemiSql,
    "q_anti_join" -> qAntiSql,
    "q_rollup" -> qRollupSql,
    "q_cube" -> qCubeSql,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_topk_per_group" -> qTopPerSegmentSql,
    // same oracle: the custom bounded-heap operator must reproduce the
    // window form bit-for-bit
    "q_topk_native" -> qTopPerSegmentSql,
    "q_window_running" -> qRunningSql,
    "q_window_lag" -> qGapsSql,
    "q_min_by" -> qMinBySql,
    "q_set_ops" -> qSetOpsSql,
    "q_percentiles" -> qPercentilesSql,
    "q_salted_agg" -> qSaltedAggSql,
    "q_salted_join" -> qSaltedJoinSql,
    "ev_session_window" -> evSessionWindowSql,
    "q_outer_left" -> qOuterLeftSql,
    "q_outer_full" -> qOuterFullSql,
    "q_pivot" -> qPivotSql,
    "q_ntile" -> qNtileSql,
    "q_corr_scalar" -> qCorrScalarSql,
    // Q2 shape: the ORACLE keeps the correlated scalar-min subquery
    // (DuckDB decorrelates it the same way the Spark side is written)
    "q_min_cost_supplier" ->
      """SELECT DISTINCT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
        |  n.n_name, l.l_extendedprice AS min_price
        |FROM part p, lineitem l, supplier s, nation n
        |WHERE l.l_partkey = p.p_partkey AND l.l_suppkey = s.s_suppkey
        |  AND s.s_nationkey = n.n_nationkey AND p.p_size <= 5
        |  AND l.l_extendedprice =
        |      (SELECT min(l2.l_extendedprice) FROM lineitem l2
        |       WHERE l2.l_partkey = p.p_partkey)
        |ORDER BY p.p_partkey, s.s_suppkey""".stripMargin,
    // Q21 shape: chained EXISTS / NOT EXISTS with a supplier-inequality
    // residual on the order key
    "q_sole_blame" ->
      """SELECT s.s_name, count(*) AS numwait
        |FROM supplier s, lineitem l1, orders o
        |WHERE s.s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
        |  AND o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name
        |LIMIT 20""".stripMargin,
    // Q17 shape: the ORACLE keeps the correlated scalar-AVG subquery
    // (DuckDB decorrelates it into the same per-part aggregate the
    // Spark side writes explicitly); the 0.2·avg comparison is the
    // exact-integer form 5·qty·n < sum on both sides
    "q_small_qty_revenue" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |    AS avg_yearly,
        |  count(*) AS n_small
        |FROM lineitem l, part p
        |WHERE l.l_partkey = p.p_partkey
        |  AND p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        |  AND CAST(l.l_quantity AS BIGINT) * 5 *
        |      (SELECT count(*) FROM lineitem l2
        |       WHERE l2.l_partkey = p.p_partkey)
        |    < (SELECT CAST(sum(CAST(l2.l_quantity AS BIGINT)) AS BIGINT)
        |       FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    // Q4 shape: EXISTS with a cross-table date-lag residual on the
    // order key (counts only — exact)
    "q_priority_wait" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // Q6 shape: pure predicate-pushdown aggregate, no join
    "q_discount_revenue" ->
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
        |    AS DOUBLE) AS forgone_revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Q9 shape: profit per (supplier nation, order year) on 'red'
    // parts; cost = 10% of retail per unit, exact integer units
    "q_profit_by_nation" ->
      """SELECT n_name AS nation,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4))) * 10000 AS BIGINT)
        |  - (CAST(sum(CAST(p_retailprice * l_quantity
        |      AS DECIMAL(18,4))) * 10000 AS BIGINT) // 10)
        |    AS profit_units
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // Q10 shape: top customers by returned-item revenue in one quarter
    "q_returned_customers" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) * 10000 AS BIGINT) AS lost_units
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1998-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-04-01'
        |GROUP BY 1, 2, 3
        |ORDER BY lost_units DESC, c_custkey
        |LIMIT 20""".stripMargin,
    // Q12 shape: two-way conditional counts of late-shipped lines per
    // ship year (no ship-mode column; late = the Q4 cross-table lag)
    "q_late_priority_mix" ->
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Q14 shape: promo revenue share per ship month, exact micro ratio
    "q_promo_share" ->
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(month(l_shipdate) AS BIGINT) AS l_month,
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |    ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT)
        |    AS promo_units,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) * 10000 AS BIGINT) AS total_units,
        |  (CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |    ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT) * 1000000)
        |    // CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4))) * 10000 AS BIGINT) AS promo_share_micro
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    // Q11 shape: the ORACLE keeps the classic scalar-subquery-over-the-
    // same-aggregate form; the threshold is the exact floored mean
    "q_important_parts" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4))) * 10000 AS BIGINT) AS value_units
        |  FROM lineitem GROUP BY 1)
        |SELECT p_partkey, p_name, p_brand, value_units
        |FROM pv JOIN part ON l_partkey = p_partkey
        |WHERE value_units * 2 >
        |  ((SELECT CAST(sum(value_units) AS BIGINT) FROM pv)
        |    // (SELECT count(*) FROM pv)) * 3
        |ORDER BY value_units DESC, p_partkey
        |LIMIT 100""".stripMargin,
    // Q16 shape: the ORACLE keeps the classic NOT IN denylist; the
    // denylist itself is the exact-integer return-rate threshold
    "q_supplier_diversity" ->
      """WITH bad AS (
        |  SELECT l_suppkey FROM lineitem
        |  GROUP BY 1
        |  HAVING CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) * 10 > CAST(count(*) AS BIGINT) * 3)
        |SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN (SELECT l_suppkey FROM bad)
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,
    // Q15 shape: the ORACLE keeps the view + scalar-max subquery; units
    // are exact BIGINT ten-thousandths on both sides
    "q_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4))) * 10000 AS BIGINT) AS total_units
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_units
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_units = (SELECT max(total_units) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    // Q20 flavor: correlated share-of-part aggregate — supplier-grain
    // partials re-sum to the part grain (one fact pass), exact integers
    "q_dominant_supplier" ->
      """WITH sp AS (
        |  SELECT l_suppkey, l_partkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
        |  FROM lineitem GROUP BY 1, 2),
        |pt AS (
        |  SELECT l_partkey, CAST(sum(supp_qty) AS BIGINT) AS part_qty
        |  FROM sp GROUP BY 1)
        |SELECT s_suppkey, s_name,
        |  count(*) AS n_dominant,
        |  CAST(sum(supp_qty) AS BIGINT) AS dom_qty
        |FROM sp
        |JOIN pt USING (l_partkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE supp_qty * 6 > part_qty
        |GROUP BY 1, 2
        |ORDER BY 1""".stripMargin,
    // Q19 shape: OR-of-ANDs disjunction over one part join
    "q_special_revenue" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 15
        |       AND p_size BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 25
        |       AND p_size BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 35
        |       AND p_size BETWEEN 1 AND 30)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    // Q22 shape: scalar-avg subquery (exact cents·n > sum form) +
    // NOT EXISTS against date-filtered orders
    "q_cust_sales_opp" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
        |  FROM customer
        |  WHERE c_nationkey IN (0,1,2,3,4,5,6,7,8,9))
        |SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |  count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM c
        |WHERE bal_cents * (SELECT count(*) FROM c c2 WHERE c2.c_acctbal > 0)
        |    > (SELECT CAST(sum(c2.bal_cents) AS BIGINT) FROM c c2
        |       WHERE c2.c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q_quarterly" -> qQuarterlySql,
    "q_string_funcs" -> qStringFuncsSql,
    "q_array_agg" -> qArrayAggSql,
    "q_monthly_revenue" ->
      """SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
        |  CAST(extract(month FROM o_orderdate) AS BIGINT) AS o_month,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_sql_exists" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 200000)
        |ORDER BY c_custkey""".stripMargin,
    "cp_hashes" -> cpHashesSql,
    "cp_readable_date" -> cpReadableDateSql,
    "cp_times_agg" -> cpTimesAggSql,
    "ev_user_stats" -> evUserStatsSql,
    // q_sketches: a from-first-principles HLL whose registers live in
    // exact integer arithmetic — the oracle replays the sketch itself.
    // (The engine-native HLL++/percentile_approx face stays test-pinned
    // — ITS internals are engine-specific by design.)
    "q_sketches" -> qSketchesSql,
    "text_stats" -> textStatsSql,
    "text_quality" -> textQualitySql,
    "text_quality_lr" -> textQualityLrSql,
    // served faces replay the SAME trained chain, projected to the
    // serving columns (scores are artifact-round-trip identical)
    "text_lr_served" ->
      s"SELECT doc_id, score, pred FROM ($textQualityLrSql) t ORDER BY doc_id",
    "text_dsir_served" ->
      s"SELECT doc_id, n_tokens, score_micro, selected FROM ($textDsirSql) t ORDER BY doc_id",
    "text_quality_lr_weights" -> textQualityLrWeightsSql,
    "text_corpus_card" -> textCorpusCardSql,
    "text_collocations" -> textCollocationsSql,
    "text_dsir" -> textDsirSql,
    "text_dsir_mix" -> textDsirMixSql,
    // samp_dsir: the DSIR chain feeding the samp_pps systematic-PPS
    // prefix-sum draw — importance resampling, hash-checked end to end
    "samp_dsir" -> sampDsirSql,
    "text_pretrain_corpus" -> textPretrainCorpusSql,
    "text_langid" -> textLangIdSql,
    "text_fingerprint" -> textFingerprintSql,
    "text_topterms" -> textTopTermsSql,
    "text_repetition" -> textRepetitionSql,
    "text_sample" -> textSampleSql,
    "text_pack" -> textPackSql,
    "text_chunks" -> textChunksSql,
    "text_boilerplate" -> textBoilerplateSql,
    "text_drift" -> textDriftSql,
    "text_novelty" -> textNoveltySql,
    "text_lm_score" -> textLmScoreSql,
    "text_bpe_pairs" -> textBpePairsSql,
    "text_bpe_merges" -> textBpeMergesSql,
    "text_bpe_fertility" -> textBpeFertilitySql,
    "text_bpe_tokens" -> textBpeTokensSql,
    "text_bpe_curve" -> textBpeCurveSql,
    "text_vocab_coverage" -> textVocabCoverageSql,
    "q_pii_scrub" -> qPiiScrubSql,
    "q_mode_median" -> qModeMedianSql,
    "q_unpivot" -> qUnpivotSql,
    "ev_funnel" -> evFunnelSql,
    "dedup_exact" -> dedupExactSql,
    "dedup_incremental" -> dedupIncrementalSql,
    "dedup_incremental_near" -> dedupIncrementalNearSql,
    "dedup_ngram_jaccard" -> dedupNgramJaccardSql,
    "dedup_clusters" -> dedupClustersSql,
    "dedup_keeper_quality" -> dedupKeeperQualitySql,
    "dedup_weights" -> dedupWeightsSql,
    "dedup_curated" -> dedupCuratedSql,
    // dedup_minhash_lsh / dedup_simhash run in engine-neutral md5-60
    // mode, so the oracle replays the full pipeline (minhash) or the
    // exact Hamming self-join the exhaustive blocking equals (simhash);
    // the narrower xxhash64 mode stays pinned by DedupSpec.
    "dedup_minhash_lsh" -> dedupMinhashLshSql,
    "dedup_lsh_eval" -> dedupLshEvalSql,
    "dedup_simhash" -> dedupSimhashSql,
    "sim_bruteforce_topk" -> simBruteForceSql,
    "sim_mmr" -> simMmrSql,
    "sim_dim_curve" -> simDimCurveSql,
    "sim_ivf_fullprobe" -> simBruteForceSql,
    // sim_pq_exact: lossless codebook (every subvector its own centroid)
    // => reconstruction is bit-identical => PQ scoring ≡ brute force —
    // on the bounded vec_id < 256 slice (the lossless codebook is a copy
    // of its corpus, so the exactness endpoint must not scale with it).
    "sim_pq_exact" -> simBruteForceCappedSql,
    // sim_ivf_topk / sim_pq_topk: the TRAINED faces are deterministic
    // (fixed-point Lloyd's means, cosine-argmax assignment), so the
    // oracle replays training end to end — see simIvfTopKSql/simPqTopKSql.
    "sim_ivf_topk" -> simIvfTopKSql,
    "sim_ivf_eval" -> simIvfEvalSql,
    "sim_ivf_curve" -> simIvfCurveSql,
    // the persisted-index serving path trains identically to the inline
    // face (same deterministic Lloyd's, same probe math), so the same
    // trained replay covers it — now exercised through cid partition
    // pruning over the parquet artifact
    "sim_ivf_served" -> simIvfTopKSql,
    "sim_pq_topk" -> simPqTopKSql,
    "sim_pq_eval" -> simPqEvalSql,
    // sim_lsh_topk / sim_near_dups: the LCG hyperplanes and in-order
    // dot folds are engine-exact, so the oracle replays bucketing,
    // probing, and verification bit-for-bit.
    "sim_near_dups" -> simNearDupsSql,
    "sim_knn_graph" -> simKnnGraphSql,
    "sim_clusters" -> simClustersSql,
    "sim_semantic_keeper" -> simSemanticKeeperSql,
    "sim_decontaminate" -> simDecontaminateSql,
    "sim_lsh_topk" -> simLshTopKSql,
    "sim_ann_eval" -> simAnnEvalSql,
    "sim_rp_reduce" -> simRpReduceSql,
    "sim_int8_quant" -> simInt8QuantSql,
    "sim_int8_topk" -> simInt8TopKSql,
    "sim_int8_eval" -> simInt8EvalSql,
    "sim_rp_topk" -> simRpTopKSql,
    "sim_rp_eval" -> simRpEvalSql,
    // row-identical to sim_rp_topk (RpSketchSpec pins it), served from
    // the persisted sketch artifact
    "sim_rp_served" -> simRpTopKSql,
    "sim_embedding_stats" -> simEmbeddingStatsSql,
    "sim_label_centroids" -> simLabelCentroidsSql,
    "sim_label_outliers" -> simLabelOutliersSql,
    "samp_shards" -> sampShardsSql,
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
         |ORDER BY media_id""".stripMargin,
    "q_corpus_diff" -> qCorpusDiffSql,
    "ev_tumbling" -> evTumblingSql,
    "ev_sliding" -> evSlidingSql,
    "ev_sessionize" -> evSessionizeSql,
    "ev_asof" -> evAsofSql,
    "ev_range_clicks" -> evRangeClicksSql,
    "ev_props_stats" -> evPropsStatsSql,
    "q_compact_latest" ->
      """SELECT event_id, ts, user_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |                               ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    "q_scd2" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER w AS valid_to,
        |  (lead(o_orderdate) OVER w IS NULL) AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,
    "q_heavy_hitters" ->
      """WITH t AS (SELECT count(*) AS total FROM events),
        |c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
        |SELECT user_id, n FROM c, t WHERE n * 1280 >= total
        |ORDER BY user_id""".stripMargin,
    "q_bloom_join" ->
      """SELECT o_orderkey, o_totalprice,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS lineitem_price,
        |  count(*) AS n_items
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 450000
        |GROUP BY 1, 2 ORDER BY o_orderkey""".stripMargin,
    "text_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
        |            FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
        |       WHERE length(token) > 0 GROUP BY 1, 2),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |t AS (SELECT count(*) AS total FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |         tf.tf * ((t.total * 1000000) // df.df) AS score_fp
        |  FROM tf JOIN df USING (token), t),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |                 ORDER BY score_fp DESC, token ASC) AS rnk
        |       FROM scored)
        |SELECT doc_id, rnk, token, tf, df, score_fp
        |FROM rk WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "q_zorder" ->
      """WITH base AS (SELECT l_partkey AS px, l_suppkey AS py,
        |                     l_partkey & 65535 AS x, l_suppkey & 65535 AS y
        |              FROM lineitem),
        |s1 AS (SELECT px, py, (x | (x << 8)) & 16711935 AS x,
        |              (y | (y << 8)) & 16711935 AS y FROM base),
        |s2 AS (SELECT px, py, (x | (x << 4)) & 252645135 AS x,
        |              (y | (y << 4)) & 252645135 AS y FROM s1),
        |s3 AS (SELECT px, py, (x | (x << 2)) & 858993459 AS x,
        |              (y | (y << 2)) & 858993459 AS y FROM s2),
        |s4 AS (SELECT px, py, (x | (x << 1)) & 1431655765 AS x,
        |              (y | (y << 1)) & 1431655765 AS y FROM s3),
        |z AS (SELECT px, py, (x | (y << 1)) AS zval FROM s4)
        |SELECT (zval * 64) // ((SELECT max(zval) FROM z) + 1) AS bucket,
        |       count(*) AS n,
        |       min(px) AS min_part, max(px) AS max_part,
        |       min(py) AS min_supp, max(py) AS max_supp
        |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_upsert" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 450000 THEN 'X' ELSE o_orderstatus END
        |    AS o_orderstatus,
        |  o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "dedup_decontaminate" ->
      """WITH toks AS (SELECT doc_id, source,
        |                     string_split_regex(trim(text), '\s+') AS t
        |              FROM documents),
        |sh AS (SELECT doc_id, source, list_distinct(list_transform(
        |         range(0, greatest(len(t) - 5, 0) + 1),
        |         i -> array_to_string(list_slice(t, i + 1, i + 5), ' '))) AS s
        |       FROM toks),
        |eg AS (SELECT DISTINCT unnest(s) AS gram FROM sh WHERE source = 'src0'),
        |tg AS (SELECT doc_id, unnest(s) AS gram FROM sh WHERE source <> 'src0'),
        |hits AS (SELECT doc_id, count(*) AS n FROM tg
        |         JOIN eg USING (gram) WHERE length(gram) > 0 GROUP BY 1)
        |SELECT d.doc_id, coalesce(hits.n, 0) AS n_contaminated,
        |       coalesce(hits.n, 0) > 0 AS contaminated
        |FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
        |LEFT JOIN hits ON d.doc_id = hits.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q_pagerank" -> qPageRankSql,
    "q_table_stats" -> Seq("o_custkey", "o_orderkey", "o_totalprice").map(c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS ndv,
         |  CAST(min($c) AS DOUBLE) AS min_val, CAST(max($c) AS DOUBLE) AS max_val
         |FROM orders""".stripMargin).mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    // q_cms: first-principles Count-Min sketch — the same md5-60 buckets
    // and counter minimum replayed exactly (SketchOps.cmsFrequency).
    "q_cms" -> qCmsSql,
    // q_triangles: degree-ordered orientation is integer arithmetic
    // (ord = deg·2^32 + id), so the wedge join replays bit-for-bit.
    "q_triangles" -> qTrianglesSql,
    "text_inverted" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |              FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         range(0, greatest(len(t) - 3, 0) + 1),
        |         i -> array_to_string(list_slice(t, i + 1, i + 3), ' ')))) AS phrase
        |       FROM toks),
        |g AS (SELECT phrase, count(*) AS df,
        |        string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
        |          AS postings
        |      FROM sh WHERE length(phrase) > 0 GROUP BY phrase)
        |SELECT phrase, df, postings FROM g
        |WHERE df BETWEEN 3 AND 20 ORDER BY phrase""".stripMargin,
    "samp_quota" ->
      s"""WITH d AS (SELECT lang, doc_id, source,
         |    md5('${SampleOps.quotaSeed}:' || CAST(doc_id AS VARCHAR)) AS pri
         |  FROM documents),
         |r AS (SELECT lang, doc_id, pri, source,
         |        row_number() OVER (PARTITION BY lang
         |                           ORDER BY pri, doc_id) AS rn FROM d)
         |SELECT lang, doc_id, pri, source FROM r WHERE rn <= 25
         |ORDER BY lang, pri, doc_id""".stripMargin,
    // ev_ewma: integer fixed-point time-decayed sum — every lag-j term
    // is cents >> j in both engines, so the feature replays exactly.
    "ev_ewma" -> evEwmaSql,
    // q_kcore: fixed unrolled synchronous peel — each round is a pure
    // degree filter, so the oracle replays the trajectory CTE-for-CTE.
    "q_kcore" -> qKcoreSql,
    // q_triangles_approx: DOULION edge sampling by a seeded md5
    // threshold — the sampled graph, and hence the integer-scaled
    // estimate, replays exactly.
    "q_triangles_approx" -> qTrianglesApproxSql,
    // q_quantile_sketch: bottom-k hash sample + exact order statistics
    // at dyadic quantiles — both engine-replayable by construction.
    "q_quantile_sketch" -> qQuantileSketchSql,
    "samp_split" -> sampSplitSql,
    "samp_split_leakfree" -> sampSplitLeakfreeSql,
    // the oracle's per-source window IS the per-partition-offset
    // computation (same identity samp_pps pins for the global case)
    "samp_token_budget" -> sampTokenBudgetSql,
    "samp_training_mix" -> sampTrainingMixSql,
    "q_window_range_frame" -> qWindowRangeFrameSql,
    "q_kmv_distinct" -> qKmvDistinctSql,
    // q_skyline: the oracle states the DEFINITION (dominance NOT
    // EXISTS); the engine runs the agg+broadcast rewrite — matching
    // hashes prove the rewrite implements skyline semantics.
    "q_skyline" -> qSkylineSql,
    // q_labelprop: unrolled synchronous rounds, integer-packed argmax —
    // MATERIALIZED CTEs for the same reason as q_kcore.
    "q_labelprop" -> qLabelpropSql,
    // samp_pps: exact integer prefix sums + DIV target counting — the
    // oracle's global window IS the per-partition-offset computation.
    "samp_pps" -> sampPpsSql,
    // ev_rolling_distinct: the ×7 expand identity — the oracle states
    // the trailing-window definition directly (self-join over the day
    // range), proving the expand rewrite.
    "ev_rolling_distinct" -> evRollingDistinctSql,
    // q_histogram: pure integer bucket arithmetic; the depth face's
    // global rank replays as a row_number window.
    "q_histogram" -> qHistogramSql,
    // q_asof_native: the custom AsOfJoinExec against the SAME oracle as
    // the window-based ev_asof — hash-equal results prove the operator.
    "q_asof_native" -> evAsofSql,
    "q_dq_report" -> qDqReportSql,
    // q_asof_forward: the forward direction of the custom exec; oracle
    // is the mirrored FOLLOWING-window form over the same union.
    "q_asof_forward" -> qAsofForwardSql,
    // ev_gapfill: explode-from-observed densification; integer
    // fixed-point lerp with explicit pmod floor-division replays
    // bit-for-bit in both engines.
    "ev_gapfill" -> evGapfillSql,
    // q_fuzzy_join: the oracle replays the FastSS deletion-neighborhood
    // blocking with STRING keys (hashing is a Spark-side narrowing that
    // provably cannot change the verified output) and the levenshtein
    // verify that defines the relation.
    "q_fuzzy_join" -> qFuzzyJoinSql,
    // q_compaction_plan: next-fit bin packing on the file listing —
    // pure integer running-sum arithmetic, exact in any engine.
    "q_compaction_plan" -> qCompactionPlanSql,
    // q_outliers_mad: doubled/quadrupled integer medians — no division,
    // no floats, so median, MAD, and the 3×MAD fence replay exactly.
    "q_outliers_mad" -> qOutliersMadSql,
    // q_bfs: fixed unrolled frontier rounds over the same co-occurrence
    // edge CTE as the other graph oracles — min-distance union per
    // round, MATERIALIZED for the q_kcore reason.
    "q_bfs" -> qBfsSql,
    // ev_retention: Monday-truncated weeks in both engines; offsets are
    // exact integer week counts, n_users exact distinct counts.
    "ev_retention" -> evRetentionSql,
    // ev_markov: identical windows (ts, event_id tie-break); p is the
    // IEEE division of two exact integer counts.
    "ev_markov" -> evMarkovSql,
    // q_assoc_rules: all supports are exact integer counts; conf/lift
    // are IEEE divisions of exact integer products, and the top-100
    // order is total (lift DESC, a, b) so the cut is deterministic.
    "q_assoc_rules" -> qAssocRulesSql,
    // ev_interval_overlap: pure integer epoch-microsecond arithmetic;
    // the oracle runs the θ-join directly (DuckDB IEJoin), the Spark
    // side the bucketed equi decomposition — same pair set.
    "ev_interval_overlap" -> evIntervalOverlapSql,
    // q_sssp: integer weights (1 + 100 DIV support) and integer cost
    // sums; fixed Bellman-Ford rounds unroll to min-union CTEs.
    "q_sssp" -> qSsspSql,
    // ev_rfm: quintiles replay as plain ntile(5) because every ordering
    // includes user_id (total order); metrics are exact integers/dates.
    "ev_rfm" -> evRfmSql,
    // q_linreg: sufficient statistics are exact BIGINT sums; slope/
    // intercept/r2 replay as the SAME IEEE operation tree over them.
    "q_linreg" -> qLinregSql,
    // dedup_passages: shingle strings replay verbatim (the dedup_ngram
    // tokenizer CTE with n=8); counts exact, frac one IEEE division.
    "dedup_passages" -> dedupPassagesSql,
    "dedup_spans" -> dedupSpansSql,
    // samp_temperature: ⌊√n·2²⁰⌋ keeps the normalizer an exact integer
    // sum; rate is one IEEE division and md5-60 replays in DuckDB.
    "samp_temperature" -> sampTemperatureSql,
    // ev_attribution / ev_conversion_lag: identical (ts, event_id)
    // windows; cents and minute buckets are exact integers.
    "ev_attribution" -> evAttributionSql,
    "ev_conversion_lag" -> evConversionLagSql,
    // ev_anomaly: the 3σ test cross-multiplied into exact BIGINTs —
    // no division or sqrt anywhere, flags replay bit-for-bit.
    "ev_anomaly" -> evAnomalySql,
    "ev_cusum" -> evCusumSql,
    // the served face merges the same daily counts and re-derives the
    // same statistic, so the batch oracle hash-checks the streamed path
    "ev_cusum_served" -> evCusumSql,
    // the alert SINK: the page the last committed batch overwrote ==
    // the batch statistic's flagged slice
    "ev_cusum_alerts" ->
      s"SELECT * FROM ($evCusumSql) t WHERE shift_flag ORDER BY event_type, day_num",
    // served view partials are an exact monoid: cent-quantized sums
    // merge associatively, so the batch aggregate replays the protocol
    "ev_view_served" ->
      """SELECT event_type,
        |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
        |    AS total,
        |  count(*) AS n_rows
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ev_seasonality" -> evSeasonalitySql,
    "ev_weekend_chi2" -> evWeekendChi2Sql,
    // q_price_bands: doubled quantiles (lower+upper pair) — integer
    // cents, no fractions, same threshold rule in both engines.
    "q_price_bands" -> qPriceBandsSql,
    // q_asof_tolerance: the evAsof window form with the 30-minute band
    // applied to its pick — equivalent because the pick is the closest.
    "q_asof_tolerance" -> evAsofToleranceSql,
    // ev_trigrams: identical windows, exact counts, total-order top-25.
    "ev_trigrams" -> evTrigramsSql,
    // q_ship_latency: exact integer day lags.
    "q_ship_latency" -> qShipLatencySql,
    // ev_concentration: ntile(10) replays the closed-form deciles
    // (total order via user_id tie-break); all exact cents.
    "ev_concentration" -> evConcentrationSql,
    // q_degree_dist: ⌊log₂⌋ from the binary-string length — integer-
    // exact buckets, no float log at power-of-two boundaries.
    "q_degree_dist" -> qDegreeDistSql,
    // q_half_coverage: integer cents; "needed" = coverage not reached
    // BEFORE the row (2·(cum−own) < total) — no halving, no floats.
    "q_half_coverage" -> qHalfCoverageSql
  )

  private val qHalfCoverageSql: String =
    """WITH pc AS MATERIALIZED (
      |  SELECT n_name, c_custkey,
      |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |               JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      |w AS (SELECT n_name, cents,
      |  CAST(sum(cents) OVER (PARTITION BY n_name
      |    ORDER BY cents DESC, c_custkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |  CAST(sum(cents) OVER (PARTITION BY n_name) AS BIGINT) AS total
      |  FROM pc)
      |SELECT n_name, count(*) AS n_customers, max(total) AS total_cents,
      |  CAST(sum(CASE WHEN 2 * (cum - cents) < total THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_half_coverage
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin

  private val qDegreeDistSql: String =
    """WITH li AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |e0 AS MATERIALIZED (SELECT DISTINCT x.pk AS a, y.pk AS b
      |       FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
      |deg AS (SELECT v, count(*) AS deg FROM (
      |          SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0)
      |        GROUP BY 1)
      |SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS log2_bucket,
      |  count(*) AS n_vertices, CAST(sum(deg) AS BIGINT) AS sum_deg
      |FROM deg GROUP BY 1 ORDER BY 1""".stripMargin

  private val evConcentrationSql: String =
    """WITH u AS MATERIALIZED (
      |  SELECT user_id, sum(CAST(round(value * 100) AS BIGINT)) AS cents
      |  FROM events GROUP BY 1),
      |d AS (SELECT CAST(ntile(10) OVER (ORDER BY cents, user_id) AS BIGINT)
      |        AS decile, cents FROM u),
      |g AS (SELECT decile, count(*) AS n_users,
      |        CAST(sum(cents) AS BIGINT) AS cents
      |      FROM d GROUP BY 1)
      |SELECT decile, n_users, cents,
      |  CAST(sum(cents) OVER (ORDER BY decile
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_cents
      |FROM g ORDER BY 1""".stripMargin

  private val evTrigramsSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |                  CAST(ts AS TIMESTAMP) AS ts FROM events),
      |seq AS MATERIALIZED (
      |  SELECT event_type AS e1,
      |    lead(event_type, 1) OVER w AS e2,
      |    lead(event_type, 2) OVER w AS e3
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT e1, e2, e3, count(*) AS n
      |FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      |GROUP BY 1, 2, 3 ORDER BY n DESC, e1, e2, e3 LIMIT 25""".stripMargin

  private val qShipLatencySql: String =
    """SELECT o_orderpriority AS priority,
      |  date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lag_days,
      |  count(*) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val evAsofToleranceSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |                  epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |           FROM events WHERE event_type IN ('view', 'purchase')),
      |w AS (SELECT *, max(CASE WHEN event_type = 'view' THEN us END) OVER
      |        (PARTITION BY user_id ORDER BY us, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_us
      |      FROM e)
      |SELECT event_id, user_id, us // 1000000 AS purchase_epoch,
      |       CASE WHEN us - last_view_us <= 1800000000
      |            THEN last_view_us // 1000000 END AS last_view_epoch
      |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  private val qPriceBandsSql: String =
    """WITH vc AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS c, count(*) AS cnt
      |  FROM orders GROUP BY 1, 2),
      |w AS MATERIALIZED (SELECT month, c, cnt,
      |    CAST(sum(cnt) OVER (PARTITION BY month ORDER BY c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(sum(cnt) OVER (PARTITION BY month) AS BIGINT) AS n
      |  FROM vc),
      |q AS (SELECT month, max(n) AS n,
      |    min(CASE WHEN cum >= (1 * n + 3) // 4 THEN c END) +
      |      min(CASE WHEN cum >= (1 * n) // 4 + 1 THEN c END) AS q1_x2,
      |    min(CASE WHEN cum >= (1 * n + 1) // 2 THEN c END) +
      |      min(CASE WHEN cum >= (1 * n) // 2 + 1 THEN c END) AS med_x2,
      |    min(CASE WHEN cum >= (3 * n + 3) // 4 THEN c END) +
      |      min(CASE WHEN cum >= (3 * n) // 4 + 1 THEN c END) AS q3_x2
      |  FROM w GROUP BY 1)
      |SELECT month, n, q1_x2, med_x2, q3_x2, q3_x2 - q1_x2 AS iqr_x2
      |FROM q ORDER BY 1""".stripMargin

  /** Replay of EventOps.cusumShift: same integer-scaled deviations and
    * the prefix-sum identity for the max(0, ·) recurrence. */
  private val evCusumSql: String =
    """WITH sparse AS MATERIALIZED (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
      |           AS day_num,
      |         CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT min(day_num) AS d0, max(day_num) AS d1 FROM sparse),
      |daily AS MATERIALIZED (
      |  SELECT t.event_type, g.day_num,
      |         CAST(coalesce(s.n_events, 0) AS BIGINT) AS n_events
      |  FROM (SELECT DISTINCT event_type FROM sparse) t
      |  CROSS JOIN (SELECT unnest(generate_series(d0, d1)) AS day_num
      |              FROM span) g
      |  LEFT JOIN sparse s
      |    ON s.event_type = t.event_type AND s.day_num = g.day_num),
      |tot AS (SELECT event_type, CAST(sum(n_events) AS BIGINT) AS total,
      |               CAST(count(*) AS BIGINT) AS n_days
      |        FROM daily GROUP BY 1),
      |dev AS (SELECT d.event_type, d.day_num, d.n_events, t.total,
      |          d.n_events * t.n_days - t.total AS dev
      |        FROM daily d JOIN tot t USING (event_type)),
      |ps AS (SELECT event_type, day_num, n_events, total, dev,
      |         sum(dev) OVER (PARTITION BY event_type ORDER BY day_num
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      |       FROM dev),
      |cs AS (SELECT event_type, day_num, n_events, total, dev, p,
      |         min(p) OVER (PARTITION BY event_type ORDER BY day_num
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmin
      |       FROM ps)
      |SELECT event_type, day_num, n_events, dev,
      |  CAST(p - least(0, runmin) AS BIGINT) AS cusum,
      |  (p - least(0, runmin)) > total AS shift_flag
      |FROM cs ORDER BY event_type, day_num""".stripMargin

  /** Replay of EventOps.seasonality: same epoch-day bucketing, dow =
    * day % 7 (0 = Thursday), fixed-point dow mean, and the
    * (|resid| DESC, day ASC) per-dow argmax as a window rank. */
  private val evSeasonalitySql: String =
    """WITH daily AS (
      |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_num,
      |         CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1),
      |d2 AS (SELECT day_num, n_events, day_num % 7 AS dow FROM daily),
      |prof AS (SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
      |                CAST(sum(n_events) AS BIGINT) AS total
      |         FROM d2 GROUP BY dow),
      |p2 AS (SELECT dow, n_days, total,
      |         (total * 1000000) // n_days AS mean_micro FROM prof),
      |r AS (SELECT d2.dow, d2.day_num, p2.n_days, p2.total, p2.mean_micro,
      |        d2.n_events * 1000000 - p2.mean_micro AS resid_micro
      |      FROM d2 JOIN p2 USING (dow)),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY dow
      |         ORDER BY abs(resid_micro) DESC, day_num ASC) AS rn
      |       FROM r)
      |SELECT dow, n_days, total, mean_micro,
      |  day_num AS peak_day, resid_micro AS peak_resid_micro
      |FROM rk WHERE rn = 1 ORDER BY dow""".stripMargin

  /** Replay of EventOps.weekendChi2: identical cell counts, DIV
    * shares, and the SAME double operand tree for the statistic. */
  private val evWeekendChi2Sql: String =
    """WITH e AS (
      |  SELECT event_type,
      |    ((epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) % 7) IN (2, 3)
      |      AS weekend
      |  FROM events),
      |bt AS (SELECT event_type,
      |         CAST(sum(CASE WHEN weekend THEN 1 ELSE 0 END) AS BIGINT) AS a,
      |         CAST(sum(CASE WHEN weekend THEN 0 ELSE 1 END) AS BIGINT) AS b
      |       FROM e GROUP BY event_type),
      |m AS (SELECT CAST(sum(a) AS BIGINT) AS w, CAST(sum(b) AS BIGINT) AS x
      |      FROM bt),
      |cells AS (SELECT event_type, a, b, w - a AS c, x - b AS d, w, x
      |          FROM bt CROSS JOIN m)
      |SELECT event_type, a AS n_weekend, b AS n_weekday,
      |  (a * 1000000) // (a + b) AS weekend_share_micro,
      |  (w * 1000000) // (w + x) AS base_share_micro,
      |  round(CASE WHEN c + d = 0 OR a + c = 0 OR b + d = 0 THEN 0.0
      |        ELSE (CAST(a + b + c + d AS DOUBLE)
      |         * CAST(a * d - b * c AS DOUBLE)
      |         * CAST(a * d - b * c AS DOUBLE))
      |        / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
      |           * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)) END, 6) AS chi2
      |FROM cells ORDER BY event_type""".stripMargin

  private val evAnomalySql: String =
    """WITH h AS MATERIALIZED (
      |  SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600
      |           AS hour_start,
      |         count(*) AS n_events
      |  FROM events GROUP BY 1),
      |st AS (SELECT count(*) AS n, CAST(sum(n_events) AS BIGINT) AS s,
      |              CAST(sum(n_events * n_events) AS BIGINT) AS q
      |       FROM h)
      |SELECT hour_start, n_events,
      |  (n * n_events - s) * (n * n_events - s) > 9 * (n * q - s * s)
      |    AS is_anomaly
      |FROM h CROSS JOIN st ORDER BY 1""".stripMargin

  private val evAttributionSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |             CAST(round(value * 100) AS BIGINT) AS cents,
      |             CAST(ts AS TIMESTAMP) AS ts FROM events),
      |w AS MATERIALIZED (
      |  SELECT event_type, cents,
      |    first_value(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_touch,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
      |               IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
      |  FROM e),
      |p AS (SELECT * FROM w WHERE event_type = 'purchase'),
      |u AS (SELECT 'first' AS model, first_touch AS event_type, cents FROM p
      |      UNION ALL
      |      SELECT 'last', coalesce(last_touch, 'none'), cents FROM p)
      |SELECT model, event_type, count(*) AS n_purchases,
      |  CAST(sum(cents) AS BIGINT) AS cents
      |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val evConversionLagSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |             CAST(ts AS TIMESTAMP) AS ts FROM events
      |           WHERE event_type IN ('view', 'purchase')),
      |w AS MATERIALIZED (
      |  SELECT event_type, us,
      |    last_value(CASE WHEN event_type = 'view' THEN us END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lv
      |  FROM e)
      |SELECT (us - lv) // 60000000 AS lag_minutes, count(*) AS n
      |FROM w WHERE event_type = 'purchase' AND lv IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private val dedupPassagesSql: String = {
    val n = graft.ext.DedupOps.passageN
    val t = graft.ext.DedupOps.passageDfMin
    s"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
       |              FROM documents),
       |sh AS (SELECT doc_id, list_distinct(list_transform(
       |         range(0, greatest(len(t) - $n, 0) + 1),
       |         i -> array_to_string(list_slice(t, i + 1, i + $n), ' '))) AS s
       |       FROM toks),
       |ex AS MATERIALIZED (SELECT doc_id, unnest(s) AS sh FROM sh),
       |d AS (SELECT sh, count(*) AS df FROM ex GROUP BY 1)
       |SELECT doc_id, count(*) AS n_passages,
       |  CAST(sum(CASE WHEN d.df >= $t THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       |  CAST(sum(CASE WHEN d.df >= $t THEN 1 ELSE 0 END) AS DOUBLE) /
       |    CAST(count(*) AS DOUBLE) AS shared_frac
       |FROM ex JOIN d USING (sh)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Replay of DedupOps.duplicatedSpans: identical positional explode,
    * running char offsets over the canonical single-space join, lead()
    * grams, corpus-wide occurrence floor, and the gaps-and-islands
    * interval union. All integers until the one final division. */
  // lazy: referenced by textPretrainCorpusSql, which initializes
  // earlier in this object's declaration order
  private lazy val spanChainCtes: String = {
    val k = graft.ext.DedupOps.spanK
    val m = graft.ext.DedupOps.spanMinOccur
    val leads = (1 until k).map(j => s"lead(w, $j) OVER dw").mkString(", ")
    s"""words AS (
       |  SELECT doc_id, u.i AS i, u.w AS w FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
       |        i -> struct_pack(i := i, w := toks[i]))) AS u
       |    FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |          FROM documents)) t
       |  WHERE len(u.w) > 0),
       |offs AS (
       |  SELECT doc_id, i, w,
       |    coalesce(sum(len(w) + 1) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
       |  FROM words),
       |grams AS (
       |  SELECT doc_id, s, s + len(gram) AS e, gram FROM (
       |    SELECT doc_id, s, concat_ws(' ', w, $leads) AS gram,
       |      lead(w, ${k - 1}) OVER dw AS last_w
       |    FROM offs WINDOW dw AS (PARTITION BY doc_id ORDER BY i)) g
       |  WHERE last_w IS NOT NULL),
       |dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= $m),
       |spans AS (SELECT g.doc_id, g.s, g.e FROM grams g JOIN dup USING (gram)),
       |isl AS (
       |  SELECT doc_id, s, e,
       |    sum(CASE WHEN s > coalesce(mpe, -1) THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY s ROWS UNBOUNDED PRECEDING)
       |      AS island
       |  FROM (SELECT doc_id, s, e,
       |          max(e) OVER (PARTITION BY doc_id ORDER BY s
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mpe
       |        FROM spans) x),
       |perdoc AS (
       |  SELECT doc_id, CAST(sum(n_w) AS BIGINT) AS n_dup_windows,
       |    CAST(sum(covered) AS BIGINT) AS covered_chars
       |  FROM (SELECT doc_id, island, count(*) AS n_w,
       |          max(e) - min(s) AS covered
       |        FROM isl GROUP BY doc_id, island) y
       |  GROUP BY doc_id),
       |canon AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |    CAST(sum(len(w)) + count(*) - 1 AS BIGINT) AS canon_chars
       |  FROM words GROUP BY doc_id)""".stripMargin
  }

  private val dedupSpansSql: String =
    s"""WITH $spanChainCtes
       |SELECT c.doc_id, c.n_words,
       |  CAST(coalesce(p.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       |  CAST(coalesce(p.covered_chars, 0) AS BIGINT) AS covered_chars,
       |  c.canon_chars,
       |  CASE WHEN c.canon_chars > 0
       |    THEN CAST(coalesce(p.covered_chars, 0) AS DOUBLE) /
       |         CAST(c.canon_chars AS DOUBLE)
       |    ELSE 0.0 END AS dup_frac
       |FROM canon c LEFT JOIN perdoc p USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  private val sampTemperatureSql: String = {
    val b = graft.ext.SampleOps.temperatureBudget
    val seed = graft.ext.SampleOps.temperatureSeed
    s"""WITH strata AS MATERIALIZED (
       |  SELECT lang, count(*) AS n,
       |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1048576) AS BIGINT) AS isq
       |  FROM documents GROUP BY 1),
       |norm AS (SELECT CAST(sum(isq) AS BIGINT) AS s FROM strata),
       |rates AS (SELECT lang, n AS n_lang,
       |    CAST(floor(least(1.0, CAST($b * isq AS DOUBLE) /
       |                          CAST(s * n AS DOUBLE)) *
       |               1152921504606846976) AS BIGINT) AS thresh
       |  FROM strata CROSS JOIN norm)
       |SELECT doc_id, documents.lang, source, n_lang
       |FROM documents JOIN rates ON documents.lang = rates.lang
       |WHERE CAST(('0x' || substr(md5('$seed:' || CAST(doc_id AS VARCHAR)),
       |                           1, 15)) AS BIGINT) < thresh
       |ORDER BY doc_id""".stripMargin
  }

  private val qLinregSql: String =
    """WITH d AS (SELECT p_brand,
      |    CAST(round(l_quantity) AS BIGINT) AS x,
      |    CAST(round(l_extendedprice) AS BIGINT) AS y
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |s AS MATERIALIZED (SELECT p_brand, count(*) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM d GROUP BY 1)
      |SELECT p_brand, n,
      |  CAST(n * sxy - sx * sy AS DOUBLE) /
      |    CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
      |  (CAST(sy AS DOUBLE) -
      |    (CAST(n * sxy - sx * sy AS DOUBLE) /
      |     CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE)) /
      |    CAST(n AS DOUBLE) AS intercept,
      |  (CAST(n * sxy - sx * sy AS DOUBLE) *
      |   CAST(n * sxy - sx * sy AS DOUBLE)) /
      |  (CAST(n * sxx - sx * sx AS DOUBLE) *
      |   CAST(n * syy - sy * sy AS DOUBLE)) AS r2
      |FROM s ORDER BY p_brand""".stripMargin

  private val evRfmSql: String =
    """WITH u AS MATERIALIZED (
      |  SELECT user_id, max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS last_day,
      |    count(*) AS n_events,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1),
      |s AS (SELECT user_id, last_day, n_events, cents,
      |  CAST(ntile(5) OVER (ORDER BY last_day, user_id) AS BIGINT) AS r,
      |  CAST(ntile(5) OVER (ORDER BY n_events, user_id) AS BIGINT) AS f,
      |  CAST(ntile(5) OVER (ORDER BY cents, user_id) AS BIGINT) AS m
      |  FROM u)
      |SELECT user_id, last_day, n_events, cents, r, f, m,
      |  r * 100 + f * 10 + m AS rfm
      |FROM s ORDER BY user_id""".stripMargin

  private val qSsspSql: String = {
    val rounds = graft.operators.GraphOps.ssspRounds
    val sb = new StringBuilder
    sb.append(
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e0 AS MATERIALIZED (SELECT x.pk AS a, y.pk AS b, count(*) AS n
        |       FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
        |       GROUP BY 1, 2),
        |w0 AS MATERIALIZED (SELECT a, b, 1 + 100 // n AS w FROM e0),
        |und AS MATERIALIZED (SELECT a AS u, b AS v, w FROM w0
        |       UNION ALL SELECT b, a, w FROM w0),
        |d0 AS MATERIALIZED (
        |  SELECT DISTINCT u AS node, CAST(0 AS BIGINT) AS cost
        |  FROM und WHERE u % 100 = 0)""".stripMargin)
    for (r <- 1 to rounds) {
      sb.append(s""",
         |d$r AS MATERIALIZED (
         |  SELECT node, min(cost) AS cost FROM (
         |    SELECT node, cost FROM d${r - 1}
         |    UNION ALL
         |    SELECT und.u AS node, f.cost + und.w AS cost
         |    FROM und JOIN d${r - 1} f ON und.v = f.node) GROUP BY 1)""".stripMargin)
    }
    sb.append(s"""
       |SELECT node, CAST(cost AS BIGINT) AS cost
       |FROM d$rounds ORDER BY 1""".stripMargin)
    sb.toString
  }

  private val evIntervalOverlapSql: String =
    """WITH e AS (SELECT user_id, event_type,
      |             CAST(round(value * 100) AS BIGINT) AS cv,
      |             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |             CAST(ts AS DATE) AS day FROM events),
      |act AS MATERIALIZED (
      |  SELECT user_id, day, min(us) AS a_start, max(us) AS a_end
      |  FROM e GROUP BY 1, 2),
      |inc AS MATERIALIZED (
      |  SELECT us - 300000000 AS b_start, us + 300000000 AS b_end
      |  FROM e WHERE event_type = 'error' AND cv % 97 = 0)
      |SELECT user_id, day, count(*) AS n_incidents,
      |  CAST(sum(least(a_end, b_end) - greatest(a_start, b_start)) AS BIGINT)
      |    AS overlap_us
      |FROM act JOIN inc ON a_start <= b_end AND b_start <= a_end
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val qAssocRulesSql: String = {
    val ms = graft.operators.BasketOps.minSupport
    val k = graft.operators.BasketOps.topK
    s"""WITH li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |p AS MATERIALIZED (
       |  SELECT x.pk AS a, y.pk AS b, count(*) AS n_ab
       |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk
       |  GROUP BY 1, 2 HAVING count(*) >= $ms),
       |items AS (SELECT pk, count(*) AS n_item FROM li GROUP BY 1),
       |n AS (SELECT count(DISTINCT ok) AS n_orders FROM li)
       |SELECT p.a, p.b, p.n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
       |  CAST(p.n_ab AS DOUBLE) / CAST(ia.n_item AS DOUBLE) AS conf,
       |  CAST(p.n_ab * n.n_orders AS DOUBLE) /
       |    CAST(ia.n_item * ib.n_item AS DOUBLE) AS lift
       |FROM p JOIN items ia ON p.a = ia.pk JOIN items ib ON p.b = ib.pk
       |CROSS JOIN n
       |ORDER BY lift DESC, p.a, p.b LIMIT $k""".stripMargin
  }

  private val evRetentionSql: String =
    """WITH uw AS MATERIALIZED (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
      |  FROM events),
      |coh AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY 1)
      |SELECT cohort_week,
      |  CAST((uw.week - coh.cohort_week) // 7 AS BIGINT) AS week_offset,
      |  count(*) AS n_users
      |FROM uw JOIN coh USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val evMarkovSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |                  CAST(ts AS TIMESTAMP) AS ts FROM events),
      |seq AS MATERIALIZED (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |                           ORDER BY ts, event_id) AS to_type
      |  FROM e),
      |c AS (SELECT from_type, to_type, count(*) AS n
      |      FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type)
      |                           AS DOUBLE) AS p
      |FROM c ORDER BY 1, 2""".stripMargin

  private val qBfsSql: String = {
    val rounds = graft.operators.GraphOps.bfsRounds
    val sb = new StringBuilder
    sb.append(
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e0 AS MATERIALIZED (SELECT DISTINCT x.pk AS a, y.pk AS b
        |       FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
        |und AS MATERIALIZED (SELECT a AS u, b AS v FROM e0
        |       UNION ALL SELECT b, a FROM e0),
        |d0 AS MATERIALIZED (
        |  SELECT DISTINCT u AS node, CAST(0 AS BIGINT) AS dist
        |  FROM und WHERE u % 100 = 0)""".stripMargin)
    for (r <- 1 to rounds) {
      sb.append(s""",
         |d$r AS MATERIALIZED (
         |  SELECT node, min(dist) AS dist FROM (
         |    SELECT node, dist FROM d${r - 1}
         |    UNION ALL
         |    SELECT DISTINCT und.u AS node, CAST($r AS BIGINT) AS dist
         |    FROM und JOIN d${r - 1} f ON und.v = f.node
         |    WHERE f.dist = ${r - 1}) GROUP BY 1)""".stripMargin)
    }
    sb.append(s"""
       |SELECT dist, count(*) AS n_nodes, CAST(sum(node) AS BIGINT) AS sum_node
       |FROM d$rounds GROUP BY 1 ORDER BY 1""".stripMargin)
    sb.toString
  }

  private val qOutliersMadSql: String =
    """WITH base AS MATERIALIZED (
      |  SELECT o_orderpriority AS grp,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders),
      |vc AS MATERIALIZED (SELECT grp, c, count(*) AS cnt
      |                    FROM base GROUP BY 1, 2),
      |r AS (SELECT *,
      |        sum(cnt) OVER (PARTITION BY grp ORDER BY c
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |        sum(cnt) OVER (PARTITION BY grp) AS n FROM vc),
      |med AS MATERIALIZED (
      |  SELECT grp, CAST(max(n) AS BIGINT) AS n,
      |    min(CASE WHEN cum >= (n + 1) // 2 THEN c END)
      |      + min(CASE WHEN cum >= n // 2 + 1 THEN c END) AS m2
      |  FROM r GROUP BY 1),
      |dv AS MATERIALIZED (
      |  SELECT vc.grp, abs(vc.c * 2 - med.m2) AS d, sum(cnt) AS cnt
      |  FROM vc JOIN med ON vc.grp = med.grp GROUP BY 1, 2),
      |r2 AS (SELECT *,
      |        sum(cnt) OVER (PARTITION BY grp ORDER BY d
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |        sum(cnt) OVER (PARTITION BY grp) AS n FROM dv),
      |mad AS MATERIALIZED (
      |  SELECT grp,
      |    min(CASE WHEN cum >= (n + 1) // 2 THEN d END)
      |      + min(CASE WHEN cum >= n // 2 + 1 THEN d END) AS mad4
      |  FROM r2 GROUP BY 1),
      |outl AS (
      |  SELECT dv.grp,
      |    CAST(sum(CASE WHEN dv.d * 2 > mad.mad4 * 3 THEN dv.cnt ELSE 0 END)
      |      AS BIGINT) AS n_outliers
      |  FROM dv JOIN mad ON dv.grp = mad.grp GROUP BY 1)
      |SELECT med.grp, med.n, med.m2 AS median_x2, mad.mad4 AS mad_x4,
      |       outl.n_outliers
      |FROM med JOIN mad ON med.grp = mad.grp
      |JOIN outl ON med.grp = outl.grp
      |ORDER BY 1""".stripMargin

  private val qCompactionPlanSql: String =
    """WITH f AS MATERIALIZED (
      |  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
      |         CAST(o_orderdate AS DATE) AS day,
      |         count(*) * 128 AS bytes
      |  FROM orders GROUP BY 1, 2),
      |b AS (SELECT *, CAST(sum(bytes) OVER (PARTITION BY month ORDER BY day
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |        AS cum
      |      FROM f)
      |SELECT month, (cum - bytes) // 4096 AS bin, count(*) AS n_files,
      |  CAST(sum(bytes) AS BIGINT) AS total_bytes, min(day) AS first_day,
      |  max(day) AS last_day
      |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val qFuzzyJoinSql: String =
    """WITH c AS MATERIALIZED (SELECT c_custkey AS id, c_name AS name
      |                        FROM customer),
      |k AS MATERIALIZED (
      |  SELECT id, name,
      |    CASE WHEN i = 0 THEN name
      |         ELSE substr(name, 1, i - 1) || substr(name, i + 1) END AS key
      |  FROM c, LATERAL (SELECT unnest(generate_series(0, length(name)))
      |                   AS i) t),
      |cand AS (SELECT DISTINCT a.id AS a, b.id AS b
      |         FROM k a JOIN k b ON a.key = b.key AND a.id < b.id),
      |p AS MATERIALIZED (
      |  SELECT cand.a, cand.b FROM cand
      |  JOIN c ca ON ca.id = cand.a JOIN c cb ON cb.id = cand.b
      |  WHERE levenshtein(ca.name, cb.name) <= 1),
      |s AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p)
      |SELECT a AS c_custkey, count(*) AS n_neighbors, min(b) AS nearest_key
      |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  private val evGapfillSql: String =
    """WITH daily AS MATERIALIZED (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |l AS (SELECT *,
      |        lead(day) OVER w AS nday,
      |        lead(cents) OVER w AS ncents
      |      FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      |g AS (SELECT user_id, day, cents, nday, ncents,
      |        CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
      |          CAST(coalesce(nday - 1, day) AS TIMESTAMP),
      |          INTERVAL 1 DAY)) AS DATE) AS d
      |      FROM l)
      |SELECT user_id, d, cents AS locf_cents,
      |  CASE WHEN nday IS NULL THEN cents
      |       ELSE cents + ((ncents - cents) * date_diff('day', day, d)
      |         - ((((ncents - cents) * date_diff('day', day, d))
      |              % date_diff('day', day, nday)
      |            + date_diff('day', day, nday))
      |           % date_diff('day', day, nday)))
      |         // date_diff('day', day, nday)
      |  END AS lerp_cents,
      |  (d = day) AS is_observed
      |FROM g ORDER BY user_id, d""".stripMargin

  private val qAsofForwardSql: String =
    """WITH e AS (SELECT event_id, user_id, event_type,
      |                  epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |           FROM events WHERE event_type IN ('view', 'purchase')),
      |w AS (SELECT *, min(CASE WHEN event_type = 'view' THEN us END) OVER
      |        (PARTITION BY user_id ORDER BY us, event_id
      |         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_view_us
      |      FROM e)
      |SELECT event_id, user_id, us // 1000000 AS purchase_epoch,
      |       next_view_us // 1000000 AS next_view_epoch
      |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  private val qDqReportSql: String =
    """SELECT 'documents_empty_text' AS rule,
      |  (SELECT count(*) FROM documents
      |   WHERE text IS NULL OR length(text) = 0) AS n
      |UNION ALL SELECT 'lineitem_orderkey_fk',
      |  (SELECT count(*) FROM lineitem l
      |   WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                     WHERE o.o_orderkey = l.l_orderkey))
      |UNION ALL SELECT 'lineitem_pk_dup_rows',
      |  (SELECT count(*) - count(DISTINCT (l_orderkey, l_linenumber))
      |   FROM lineitem)
      |UNION ALL SELECT 'orders_custkey_fk',
      |  (SELECT count(*) FROM orders o
      |   WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                     WHERE c.c_custkey = o.o_custkey))
      |UNION ALL SELECT 'orders_nonpositive_total',
      |  (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
      |ORDER BY rule""".stripMargin

  private val qHistogramSql: String = {
    val k = graft.operators.StatsOps.histBuckets
    s"""WITH base AS MATERIALIZED (
       |  SELECT o_orderkey AS okey,
       |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
       |  FROM orders),
       |mm AS (SELECT min(cents) AS lo_all,
       |              max(cents) - min(cents) + 1 AS span FROM base),
       |w AS (SELECT 'width' AS kind,
       |        ((cents - lo_all) * $k) // span AS bucket,
       |        min(cents) AS lo, max(cents) AS hi, count(*) AS n
       |      FROM base, mm GROUP BY 2),
       |rk AS (SELECT cents,
       |         row_number() OVER (ORDER BY cents, okey) AS rn,
       |         count(*) OVER () AS n FROM base),
       |d AS (SELECT 'depth' AS kind,
       |        CASE WHEN rn <= (n % $k) * (n // $k + 1)
       |          THEN (rn - 1) // (n // $k + 1)
       |          ELSE (n % $k) + (rn - (n % $k) * (n // $k + 1) - 1) // (n // $k)
       |        END AS bucket,
       |        min(cents) AS lo, max(cents) AS hi, count(*) AS n
       |      FROM rk GROUP BY 2)
       |SELECT * FROM w UNION ALL SELECT * FROM d
       |ORDER BY kind, bucket""".stripMargin
  }

  private val evRollingDistinctSql: String =
    """WITH byday AS MATERIALIZED (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |days AS (SELECT DISTINCT d AS day FROM byday)
      |SELECT days.day,
      |  (SELECT count(DISTINCT b.user_id) FROM byday b
      |   WHERE b.d <= days.day AND b.d >= days.day - 6) AS active_7d
      |FROM days ORDER BY day""".stripMargin

  private val sampPpsSql: String = {
    val n = SampleOps.ppsN
    s"""WITH c AS MATERIALIZED (
       |  SELECT doc_id, lang, n_chars,
       |    CAST(sum(n_chars) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
       |    CAST(sum(n_chars) OVER () AS BIGINT) AS w_total
       |  FROM documents)
       |SELECT doc_id, lang, n_chars, cum,
       |  ($n * cum) // w_total - ($n * (cum - n_chars)) // w_total AS hits
       |FROM c
       |WHERE ($n * cum) // w_total - ($n * (cum - n_chars)) // w_total > 0
       |ORDER BY doc_id""".stripMargin
  }

  private val qLabelpropSql: String = {
    val rounds = graft.operators.GraphOps.lpaRounds
    val sb = new StringBuilder
    sb.append(
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e0 AS MATERIALIZED (SELECT DISTINCT x.pk AS a, y.pk AS b
        |       FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
        |und AS MATERIALIZED (SELECT a AS u, b AS v FROM e0
        |       UNION ALL SELECT b, a FROM e0),
        |l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM und)""".stripMargin)
    for (r <- 1 to rounds) {
      sb.append(s""",
        |l$r AS MATERIALIZED (
        |  SELECT u AS node,
        |    4294967295 - (max(cnt * 4294967296 + (4294967295 - label))
        |                  % 4294967296) AS label
        |  FROM (SELECT und.u, l.label, count(*) AS cnt
        |        FROM und JOIN l${r - 1} l ON und.v = l.node GROUP BY 1, 2)
        |  GROUP BY 1)""".stripMargin)
    }
    sb.append(s"""
      |SELECT node, label, comm_size
      |FROM l$rounds JOIN (SELECT label, count(*) AS comm_size
      |                    FROM l$rounds GROUP BY 1) USING (label)
      |ORDER BY node""".stripMargin)
    sb.toString
  }

  /** 80/10/10 hash split: same md5-prefix thresholds as the Spark side. */
  private val sampSplitSql: String =
    s"""SELECT CASE
       |    WHEN substr(md5('${SampleOps.splitSeed}:' || CAST(doc_id AS VARCHAR)), 1, 4)
       |         < '${SampleOps.splitTrainHex}' THEN 'train'
       |    WHEN substr(md5('${SampleOps.splitSeed}:' || CAST(doc_id AS VARCHAR)), 1, 4)
       |         < '${SampleOps.splitValHex}' THEN 'val'
       |    ELSE 'test' END AS split,
       |  lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin

  /** Replay of SampleOps.leakFreeSplit: near-dup cluster labels via the
    * shared recursive-CTE walk (same transitive closure as
    * dedup_clusters), cluster_key = label (own doc_id when unclustered),
    * then the identical md5 hex-threshold split keyed on the CLUSTER. */
  /** The md5 hex-threshold split as a SQL CASE over any key expression
    * — shared by the doc-keyed, cluster-keyed, and capstone replays. */
  private def splitCase(key: String): String =
    s"""CASE
       |    WHEN substr(md5('${SampleOps.splitSeed}:' || CAST($key AS VARCHAR)), 1, 4)
       |         < '${SampleOps.splitTrainHex}' THEN 'train'
       |    WHEN substr(md5('${SampleOps.splitSeed}:' || CAST($key AS VARCHAR)), 1, 4)
       |         < '${SampleOps.splitValHex}' THEN 'val'
       |    ELSE 'test' END""".stripMargin

  private val sampSplitLeakfreeSql: String = {
    s"""$dedupClusterCtes,
       |cl AS (SELECT u AS doc_id, min(label) AS cluster FROM walk GROUP BY u),
       |k AS (SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS cluster_key
       |      FROM (SELECT doc_id FROM documents) d
       |      LEFT JOIN cl ON cl.doc_id = d.doc_id)
       |SELECT doc_id, cluster_key, ${splitCase("cluster_key")} AS split
       |FROM k ORDER BY doc_id""".stripMargin
  }

  /** Replay of SampleOps.tokenBudgetMix: whitespace token counts,
    * md5-hash priority, per-source running sum, budget cut. The plain
    * PARTITION BY window here states the DEFINITION; the engine runs
    * the range-partitioned offset computation — matching hashes prove
    * the scale-safe rewrite implements it. */
  private val sampTokenBudgetSql: String =
    s"""WITH t AS (SELECT source, doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |    md5('${SampleOps.tokenBudgetSeed}:' || CAST(doc_id AS VARCHAR)) AS pri
       |  FROM documents),
       |c AS (SELECT source, doc_id, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY pri, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM t)
       |SELECT source, doc_id, n_tokens, cum_tokens FROM c
       |WHERE cum_tokens <= ${SampleOps.tokenBudgetPerSource}
       |ORDER BY source, cum_tokens""".stripMargin

  /** Replay of SampleOps.trainingMix — the full capstone: cluster
    * labels (recursive walk), keeper/unclustered admission
    * (cluster_key = doc_id), cluster-keyed 'train' split, then the
    * per-source token-budget window over the survivors. */
  private val sampTrainingMixSql: String =
    s"""$dedupClusterCtes,
       |cl AS (SELECT u AS doc_id, min(label) AS cluster FROM walk GROUP BY u),
       |k AS (SELECT d.doc_id, d.source, d.n_tokens,
       |        coalesce(cl.cluster, d.doc_id) AS cluster_key
       |      FROM (SELECT doc_id, source,
       |          CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
       |        FROM documents) d
       |      LEFT JOIN cl ON cl.doc_id = d.doc_id),
       |surv AS (SELECT source, doc_id, n_tokens FROM k
       |  WHERE doc_id = cluster_key
       |    AND ${splitCase("cluster_key")} = 'train'),
       |c AS (SELECT source, doc_id, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY source
       |      ORDER BY md5('${SampleOps.tokenBudgetSeed}:' || CAST(doc_id AS VARCHAR)), doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM surv)
       |SELECT source, doc_id, n_tokens, cum_tokens FROM c
       |WHERE cum_tokens <= ${SampleOps.tokenBudgetPerSource}
       |ORDER BY source, cum_tokens""".stripMargin

  /** Trailing-30-day spend: integer day numbers + cents make the RANGE
    * frame and its sums exact in both engines. */
  private val qWindowRangeFrameSql: String =
    """SELECT o_custkey, o_orderkey,
      |  (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS day_num,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
      |    PARTITION BY o_custkey ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
      |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS trailing_cents
      |FROM orders ORDER BY o_custkey, day_num, o_orderkey""".stripMargin

  /** KMV sketch replay: same md5-60 hash, same bottom-k, and the
    * estimate written as the SAME double expression (one literal, one
    * division) so even IEEE rounding matches. */
  private val qKmvDistinctSql: String = {
    val k = graft.operators.SketchOps.kmvK
    val seed = graft.operators.SketchOps.kmvSeed
    val num = s"(${(k - 1).toDouble * 1152921504606846976.0})"
    s"""WITH o AS MATERIALIZED (
       |  SELECT DISTINCT year(o_orderdate) AS y, o_custkey AS ck
       |  FROM orders WHERE year(o_orderdate) IN (1995, 1996)),
       |hh AS MATERIALIZED (
       |  SELECT y, ck,
       |    CAST(('0x' || substr(md5('$seed:' || CAST(ck AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |  FROM o),
       |samp AS MATERIALIZED (
       |  SELECT y, ck, h FROM (
       |    SELECT y, ck, h,
       |      row_number() OVER (PARTITION BY y ORDER BY h, ck) AS rn FROM hh)
       |  WHERE rn <= $k),
       |hk AS (SELECT max(CASE WHEN y = 1995 THEN hk END) AS hk95,
       |              max(CASE WHEN y = 1995 THEN ns END) AS ns95,
       |              max(CASE WHEN y = 1996 THEN hk END) AS hk96,
       |              max(CASE WHEN y = 1996 THEN ns END) AS ns96
       |       FROM (SELECT y, max(h) AS hk, count(*) AS ns FROM samp GROUP BY y)),
       |hku AS (SELECT max(h) AS hk_u, count(*) AS ns_u FROM (
       |  SELECT h, ck FROM (SELECT DISTINCT h, ck FROM samp)
       |  ORDER BY h, ck LIMIT $k)),
       |ex AS (SELECT
       |    count(DISTINCT CASE WHEN y = 1995 THEN ck END) AS exact_1995,
       |    count(DISTINCT CASE WHEN y = 1996 THEN ck END) AS exact_1996,
       |    count(DISTINCT ck) AS exact_union
       |  FROM hh),
       |est AS (SELECT
       |    CASE WHEN ns95 < $k THEN CAST(ns95 AS DOUBLE)
       |         ELSE $num / CAST(hk95 AS DOUBLE) END AS est_1995,
       |    CASE WHEN ns96 < $k THEN CAST(ns96 AS DOUBLE)
       |         ELSE $num / CAST(hk96 AS DOUBLE) END AS est_1996,
       |    CASE WHEN ns_u < $k THEN CAST(ns_u AS DOUBLE)
       |         ELSE $num / CAST(hk_u AS DOUBLE) END AS est_union
       |  FROM hk, hku)
       |SELECT CAST($k AS BIGINT) AS k,
       |  est_1995, exact_1995, est_1996, exact_1996, est_union, exact_union,
       |  est_1995 + est_1996 - est_union AS est_intersect,
       |  exact_1995 + exact_1996 - exact_union AS exact_intersect
       |FROM est, ex""".stripMargin
  }

  /** Skyline by definition: p survives iff no q is ≥ in size, ≤ in
    * price, and strictly better in one. */
  private val qSkylineSql: String =
    """WITH p AS MATERIALIZED (
      |  SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
      |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM part)
      |SELECT p_partkey, p_size, cents FROM p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM p q
      |  WHERE q.p_size >= p.p_size AND q.cents <= p.cents
      |    AND (q.p_size > p.p_size OR q.cents < p.cents))
      |ORDER BY p_size, p_partkey""".stripMargin

  private val qQuantileSketchSql: String = {
    val k = graft.operators.SketchOps.bkSampleK
    val seed = graft.operators.SketchOps.bkSeed
    s"""WITH b AS MATERIALIZED (
       |  SELECT l_returnflag AS flag, l_extendedprice AS price,
       |    l_orderkey, l_linenumber,
       |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
       |  FROM lineitem),
       |h AS MATERIALIZED (
       |  SELECT flag, price,
       |    md5('$seed:' || CAST(l_orderkey AS VARCHAR) || ':' ||
       |        CAST(l_linenumber AS VARCHAR) || ':' ||
       |        CAST(cents AS VARCHAR)) AS pri,
       |    row_number() OVER (PARTITION BY flag
       |      ORDER BY md5('$seed:' || CAST(l_orderkey AS VARCHAR) || ':' ||
       |                   CAST(l_linenumber AS VARCHAR) || ':' ||
       |                   CAST(cents AS VARCHAR)),
       |               l_orderkey, l_linenumber, cents) AS hrank
       |  FROM b),
       |samp AS MATERIALIZED (SELECT flag, price, pri FROM h WHERE hrank <= $k),
       |r AS (SELECT flag, price,
       |        row_number() OVER (PARTITION BY flag ORDER BY price, pri) AS r,
       |        count(*) OVER (PARTITION BY flag) AS s
       |      FROM samp)
       |SELECT flag AS l_returnflag, CAST(max(s) AS BIGINT) AS n_sample,
       |  max(CASE WHEN r = (s + 3) // 4 THEN price END) AS p25_est,
       |  max(CASE WHEN r = (s + 1) // 2 THEN price END) AS p50_est,
       |  max(CASE WHEN r = (3 * s + 3) // 4 THEN price END) AS p75_est
       |FROM r GROUP BY flag ORDER BY l_returnflag""".stripMargin
  }

  private val qKcoreSql: String = {
    val k = graft.operators.GraphOps.kCoreK
    val rounds = graft.operators.GraphOps.kCoreRounds
    val sb = new StringBuilder
    // MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    // round references the previous one 3× — un-materialized, the
    // 6-round unroll expands to 3^6 scans of the base tables.
    sb.append(
      """WITH li AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e0 AS MATERIALIZED (SELECT DISTINCT x.pk AS a, y.pk AS b
        |       FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk)""".stripMargin)
    for (r <- 1 to rounds) {
      sb.append(s""",
         |d$r AS MATERIALIZED (SELECT v, count(*) AS deg FROM (
         |         SELECT a AS v FROM e${r - 1}
         |         UNION ALL SELECT b FROM e${r - 1}) GROUP BY 1),
         |a$r AS MATERIALIZED (SELECT v FROM d$r WHERE deg >= $k),
         |e$r AS MATERIALIZED (SELECT a, b FROM e${r - 1}
         |        WHERE a IN (SELECT v FROM a$r)
         |          AND b IN (SELECT v FROM a$r))""".stripMargin)
    }
    val rows = (1 to rounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, " +
        s"(SELECT count(*) FROM a$r) AS n_core, " +
        s"(SELECT count(*) FROM e$r) AS n_edges_core")
    sb.append("\n" + rows.mkString("\nUNION ALL\n") + "\nORDER BY round")
    sb.toString
  }

  private val evEwmaSql: String = {
    val terms = (0 until 8).map(j =>
      s"coalesce((lag(cents, $j) OVER w) >> $j, 0)").mkString("\n      + ")
    s"""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
       |             CAST(round(value * 100) AS BIGINT) AS cents
       |           FROM events),
       |l AS (SELECT event_id, user_id, cents,
       |        row_number() OVER w AS seq,
       |        $terms AS ewma_cents
       |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT event_id, user_id, seq, cents, ewma_cents FROM l
       |ORDER BY user_id, seq""".stripMargin
  }

  private val qCmsSql: String = {
    val d = graft.operators.SketchOps.cmsDepth
    val w = graft.operators.SketchOps.cmsWidth
    val k = graft.operators.SketchOps.cmsProbeK
    s"""WITH keys AS (SELECT o_custkey AS k FROM orders),
       |hx AS (SELECT k, i,
       |    CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' ||
       |      CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) % $w AS bucket
       |  FROM keys CROSS JOIN (SELECT unnest(range($d)) AS i)),
       |counters AS (SELECT i, bucket, count(*) AS cnt FROM hx GROUP BY 1, 2),
       |probes AS (SELECT k, count(*) AS exact_cnt FROM keys GROUP BY 1
       |           ORDER BY exact_cnt DESC, k LIMIT $k),
       |pb AS (SELECT p.k, p.exact_cnt, i,
       |    CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || ':' ||
       |      CAST(p.k AS VARCHAR)), 1, 15)) AS BIGINT) % $w AS bucket
       |  FROM probes p CROSS JOIN (SELECT unnest(range($d)) AS i))
       |SELECT pb.k AS o_custkey, pb.exact_cnt, min(c.cnt) AS cms_est
       |FROM pb JOIN counters c USING (i, bucket)
       |GROUP BY 1, 2 ORDER BY o_custkey""".stripMargin
  }

  /** Shared CTE chain for the triangle oracles: degree-ordered
    * orientation + wedge closing over an edge CTE named `edges`.
    * MATERIALIZED throughout — DuckDB inlines plain CTEs and `o` is
    * referenced three times. */
  private def triangleCoreSql(edgesCte: String): String =
    s"""WITH li AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |e0 AS MATERIALIZED (SELECT DISTINCT x.pk AS a, y.pk AS b
       |       FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
       |edges AS MATERIALIZED ($edgesCte),
       |deg AS MATERIALIZED (SELECT v, count(*) AS deg FROM (
       |          SELECT a AS v FROM edges
       |          UNION ALL SELECT b FROM edges) GROUP BY 1),
       |wo AS MATERIALIZED (SELECT e.a, e.b,
       |         da.deg * 4294967296 + e.a AS orda,
       |         db.deg * 4294967296 + e.b AS ordb
       |       FROM edges e JOIN deg da ON da.v = e.a
       |                    JOIN deg db ON db.v = e.b),
       |o AS MATERIALIZED (
       |      SELECT CASE WHEN orda < ordb THEN a ELSE b END AS src,
       |             CASE WHEN orda < ordb THEN b ELSE a END AS dst,
       |             greatest(orda, ordb) AS dord FROM wo),
       |wdg AS (SELECT e1.dst AS u, e2.dst AS w FROM o e1 JOIN o e2
       |        ON e1.src = e2.src AND e1.dord < e2.dord),
       |t AS MATERIALIZED (SELECT count(*) AS n_triangles FROM wdg
       |      WHERE EXISTS (SELECT 1 FROM o
       |                    WHERE o.src = wdg.u AND o.dst = wdg.w))""".stripMargin

  private val qTrianglesSql: String =
    triangleCoreSql("SELECT a, b FROM e0") +
      """
        |SELECT (SELECT count(*) FROM deg) AS n_vertices,
        |       (SELECT count(*) FROM edges) AS n_edges,
        |       n_triangles FROM t""".stripMargin

  private val qTrianglesApproxSql: String = {
    val seed = graft.operators.GraphOps.triSampleSeed
    val den = graft.operators.GraphOps.triSampleDen
    val thresh = f"${65536 / den}%04x"
    triangleCoreSql(
      s"""SELECT a, b FROM e0
         |   WHERE substr(md5('$seed:' ||
         |     CAST(a * 4294967296 + b AS VARCHAR)), 1, 4) < '$thresh'""".stripMargin) +
      s"""
         |SELECT (SELECT count(*) FROM edges) AS n_edges_sampled,
         |       n_triangles AS tri_sampled,
         |       n_triangles * ${den.toLong * den * den} AS tri_est
         |FROM t""".stripMargin
  }
}
