package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{DedupOps, MultimodalOps, SampleOps, SimilarityOps, TextOps}
import graft.model.{Fixtures, Tables}
import graft.operators.{ChangeOps, EventOps, KubeOps, ListingOps, Relational, TimeOps}

/** relational core [EXT] (TPC-H shapes, windows, sketches, graph, stats) slice of the driver registry — split from the
  * monolithic SparkEntry (r14 judge #7). PURE move: faces, oracle SQL,
  * and registry entries are verbatim; SparkEntry composes the family
  * maps and RegistryOrderSpec pins that the composed registry's key
  * set AND iteration order are identical to the pre-split literal
  * (REGISTRY_ORDER.txt). */
private[graft] object RelationalRegistry {

  private def sqlStr(s: String): String = CpFaces.sqlStr(s)


  // ==========================================================================
  // Relational core [EXT] oracle SQL
  // ==========================================================================

  private[graft] val q1PricingSummarySql: String =
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


  private[graft] val q5RevenueByNationSql: String =
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
  private[graft] val qVolumeShippingSql: String =
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
  private[graft] val qSkewReportSql: String =
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
  private[graft] val qMarketShareSql: String =
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


  private[graft] val q3TopRevenueOrdersSql: String =
    """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
      |GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
      |ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin


  private[graft] val qBrandSql: String =
    """SELECT p_brand,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
      |  count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin


  private[graft] val qSemiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
      |ORDER BY c_custkey""".stripMargin


  private[graft] val qAntiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
      |ORDER BY c_custkey""".stripMargin


  private[graft] val qRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin


  private[graft] val qCubeSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  count(*) AS n
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin


  private[graft] val qTopPerSegmentSql: String =
    """SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY c_mktsegment
      |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |) WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin


  private[graft] val qRunningSql: String =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_total
      |FROM orders WHERE o_custkey <= 50
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin


  private[graft] val qGapsSql: String =
    """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
      |  datediff('day',
      |    CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
      |                                ORDER BY o_orderdate, o_orderkey) AS DATE),
      |    CAST(o_orderdate AS DATE)) AS gap_days
      |FROM orders WHERE o_custkey <= 50
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin


  private[graft] val qMinBySql: String =
    """SELECT o_custkey, o_orderkey AS first_orderkey,
      |       CAST(o_orderdate AS DATE) AS first_orderdate
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders
      |) WHERE rn = 1 ORDER BY o_custkey""".stripMargin


  private[graft] val qSetOpsSql: String =
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


  private[graft] val qPercentilesSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin


  private[graft] val qOuterLeftSql: String =
    """SELECT c_custkey,
      |  coalesce(cnt, 0) AS n_orders,
      |  coalesce(tot, 0.0) AS total_spent
      |FROM customer
      |LEFT JOIN (SELECT o_custkey, count(*) AS cnt,
      |             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tot
      |           FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey
      |ORDER BY c_custkey""".stripMargin


  private[graft] val qOuterFullSql: String =
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


  private[graft] val qPivotSql: String =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS f_total,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS o_total,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p_total
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin


  private[graft] val qNtileSql: String =
    """SELECT c_custkey, c_acctbal,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cume
      |FROM customer
      |WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
      |ORDER BY c_custkey""".stripMargin


  private[graft] val qCorrScalarSql: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       l_extendedprice
      |FROM lineitem a
      |WHERE l_extendedprice = (SELECT max(b.l_extendedprice) FROM lineitem b
      |                         WHERE b.l_orderkey = a.l_orderkey)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin


  private[graft] val qQuarterlySql: String =
    """SELECT CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS quarter,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_orders
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin


  private[graft] val qStringFuncsSql: String =
    """SELECT upper(split_part(p_type, ' ', 1)) AS type_head,
      |  count(*) AS n_parts,
      |  CAST(sum(CAST(length(p_name) AS DECIMAL(18,0))) AS DOUBLE) / count(*) AS avg_name_len,
      |  min(p_name) AS first_name,
      |  max(p_name) AS last_name
      |FROM part GROUP BY 1 ORDER BY 1""".stripMargin


  // array serialized to CSV in BOTH engines: pandas cannot sort/hash
  // array-typed result columns, so the comparable form is a string
  private[graft] val qArrayAggSql: String =
    """SELECT o_custkey, array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys
      |FROM orders WHERE o_custkey <= 100
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin


  /** Skew-join face: salted orders⋈customer rolled up per segment —
    * must equal the direct join (what the oracle computes). */
  private[graft] def qSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val joined = graft.operators.SkewOps.saltedJoin(
      Tables.orders(s, dir), Tables.customer(s, dir),
      "o_custkey", "c_custkey")
    joined.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        Relational.dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("c_mktsegment"))
  }


  private[graft] val qSaltedJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin


  /** A8/skew: salted two-phase aggregate — result must equal a direct
    * GROUP BY (that equality is what the oracle checks). */
  private[graft] def qSaltedAgg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    graft.operators.SkewOps.saltedAgg(
        Tables.lineitem(s, dir),
        col("l_returnflag"),
        col("l_quantity").cast(DecimalType(18, 2)))
      .select(col("k").as("l_returnflag"), col("n").cast("long").as("n"),
        col("total").cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }


  private[graft] val qSaltedAggSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin


  /** Replay of Relational.corpusDiff: snapshot B derives from the same
    * deterministic %13/%17/%19 rules, digests compare md5 over the
    * text's UTF-8 bytes in both engines, USING resolves the full-outer
    * key to the coalesced doc_id. */
  private[graft] val qCorpusDiffSql: String =
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


  private[graft] val qPiiScrubSql: String =
    """SELECT c_custkey,
      |  regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
      |  CAST(length(c_name) - length(regexp_replace(c_name, '[0-9]', '', 'g'))
      |       AS BIGINT) AS n_masked
      |FROM customer ORDER BY c_custkey""".stripMargin


  private[graft] val qModeMedianSql: String =
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


  private[graft] val qUnpivotSql: String =
    """SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value
      |FROM part
      |UNION ALL
      |SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value
      |FROM part
      |ORDER BY p_partkey, measure""".stripMargin


  /** Replay of Relational.hllNdv — the md5-60 hash, bucket/rank split,
    * exact-integer register sum and the single float division. The α·m²
    * ·2^52 numerator is inlined as one double literal (Double.toString
    * round-trips, strtod is correctly rounded) so both engines divide
    * the identical double. */
  private[graft] val qSketchesSql: String = {
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


  /** Fixed-point PageRank, 3 rounds unrolled from one template — the
    * same integer arithmetic GraphOps.pageRank runs (scale 1e12,
    * damping 85/100, truncating division ⇒ bit-identical ranks). */
  private[graft] val qPageRankSql: String = {
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


  private[graft] val qHalfCoverageSql: String =
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


  private[graft] val qDegreeDistSql: String =
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


  private[graft] val qShipLatencySql: String =
    """SELECT o_orderpriority AS priority,
      |  date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lag_days,
      |  count(*) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin


  private[graft] val qPriceBandsSql: String =
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


  private[graft] val qLinregSql: String =
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


  private[graft] val qSsspSql: String = {
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


  private[graft] val qAssocRulesSql: String = {
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


  private[graft] val qBfsSql: String = {
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


  private[graft] val qOutliersMadSql: String =
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


  private[graft] val qCompactionPlanSql: String =
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


  private[graft] val qFuzzyJoinSql: String =
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


  private[graft] val qFuzzyJoin2Sql: String =
    """WITH c AS MATERIALIZED (SELECT c_custkey AS id, c_name AS name
      |                        FROM customer),
      |k AS MATERIALIZED (
      |  SELECT DISTINCT id, key FROM (
      |    SELECT id, name AS key FROM c
      |    UNION ALL
      |    SELECT id, substr(name, 1, i - 1) || substr(name, i + 1)
      |    FROM c, LATERAL (SELECT unnest(generate_series(1, length(name)))
      |                     AS i) t
      |    UNION ALL
      |    SELECT id, substr(name, 1, i - 1) || substr(name, i + 1, j - i - 1)
      |               || substr(name, j + 1)
      |    FROM c,
      |      LATERAL (SELECT unnest(generate_series(1, length(name))) AS i) ti,
      |      LATERAL (SELECT unnest(generate_series(1, length(name))) AS j) tj
      |    WHERE j > i)),
      |cand AS (SELECT DISTINCT a.id AS a, b.id AS b
      |         FROM k a JOIN k b ON a.key = b.key AND a.id < b.id),
      |p AS MATERIALIZED (
      |  SELECT cand.a, cand.b FROM cand
      |  JOIN c ca ON ca.id = cand.a JOIN c cb ON cb.id = cand.b
      |  WHERE levenshtein(ca.name, cb.name) <= 2),
      |s AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p)
      |SELECT a AS c_custkey, count(*) AS n_neighbors, min(b) AS nearest_key
      |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  private[graft] val qAsofForwardSql: String =
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


  private[graft] val qDqReportSql: String =
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


  private[graft] val qHistogramSql: String = {
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


  private[graft] val qLabelpropSql: String = {
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


  /** Trailing-30-day spend: integer day numbers + cents make the RANGE
    * frame and its sums exact in both engines. */
  private[graft] val qWindowRangeFrameSql: String =
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
  private[graft] val qKmvDistinctSql: String = {
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
  private[graft] val qSkylineSql: String =
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


  private[graft] val qQuantileSketchSql: String = {
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


  private[graft] val qKcoreSql: String = {
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


  private[graft] val qCmsSql: String = {
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
  private[graft] def triangleCoreSql(edgesCte: String): String =
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


  private[graft] val qTrianglesSql: String =
    triangleCoreSql("SELECT a, b FROM e0") +
      """
        |SELECT (SELECT count(*) FROM deg) AS n_vertices,
        |       (SELECT count(*) FROM edges) AS n_edges,
        |       n_triangles FROM t""".stripMargin


  private[graft] val qTrianglesApproxSql: String = {
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

  private[graft] def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    "q_pii_scrub" -> ((s, d) => TextOps.scrubIds(s, d)),
    "q_mode_median" -> ((s, d) => Relational.segmentModeMedian(s, d)),
    "q_unpivot" -> ((s, d) => Relational.partMeasuresLong(s, d)),
    // incremental-pipeline bookkeeping: snapshot diff summary
    "q_corpus_diff" -> ((s, d) => Relational.corpusDiff(s, d)),

    "q_compact_latest" -> ((s, d) => ChangeOps.latestEvents(s, d)),
    "q_scd2" -> ((s, d) => ChangeOps.orderStatusHistory(s, d)),
    "q_heavy_hitters" -> ((s, d) => graft.operators.SkewOps.hotUsers(s, d)),
    "q_bloom_join" -> ((s, d) => graft.operators.BloomOps.highValueOrderRevenue(s, d)),
    "q_zorder" -> ((s, d) => graft.sources.LayoutOps.zOrderBuckets(s, d)),
    "q_upsert" -> ((s, d) => ChangeOps.correctedOrders(s, d)),
    "q_table_stats" -> ((s, d) => graft.operators.StatsOps.orderStats(s, d)),
    "q_pagerank" -> ((s, d) => graft.operators.GraphOps.pageRank(s, d)),
    "q_topk_native" -> ((s, d) => Relational.topOrdersPerSegmentNative(s, d)),
    "q_cms" -> ((s, d) => graft.operators.SketchOps.cmsFrequency(s, d)),
    "q_triangles" -> ((s, d) => graft.operators.GraphOps.triangleCount(s, d)),
    "q_kcore" -> ((s, d) => graft.operators.GraphOps.kCorePeel(s, d)),
    "q_triangles_approx" -> ((s, d) => graft.operators.GraphOps.triangleEstimate(s, d)),
    "q_quantile_sketch" -> ((s, d) => graft.operators.SketchOps.bottomKQuantiles(s, d)),
    "q_window_range_frame" -> ((s, d) => Relational.trailingSpend(s, d)),
    "q_kmv_distinct" -> ((s, d) => graft.operators.SketchOps.kmvDistinct(s, d)),
    "q_skyline" -> ((s, d) => Relational.skylineParts(s, d)),
    "q_labelprop" -> ((s, d) => graft.operators.GraphOps.labelPropagation(s, d)),
    "q_histogram" -> ((s, d) => graft.operators.StatsOps.priceHistograms(s, d)),
    "q_asof_native" -> ((s, d) => EventOps.lastViewBeforePurchaseNative(s, d)),
    "q_dq_report" -> ((s, d) => graft.operators.StatsOps.dqReport(s, d)),
    "q_asof_forward" -> ((s, d) => EventOps.nextViewAfterPurchase(s, d)),
    "q_fuzzy_join" -> ((s, d) => graft.ext.DedupOps.editDistanceNeighbors(s, d)),
    "q_fuzzy_join2" -> ((s, d) => graft.ext.DedupOps.editDistanceNeighbors2(s, d)),
    "q_compaction_plan" -> ((s, d) => graft.sources.LayoutOps.compactionPlan(s, d)),
    "q_outliers_mad" -> ((s, d) => graft.operators.StatsOps.madOutliers(s, d)),
    "q_bfs" -> ((s, d) => graft.operators.GraphOps.bfsHops(s, d)),
    "q_assoc_rules" -> ((s, d) => graft.operators.BasketOps.associationRules(s, d)),
    "q_sssp" -> ((s, d) => graft.operators.GraphOps.ssspCosts(s, d)),
    "q_linreg" -> ((s, d) => graft.operators.StatsOps.linregByBrand(s, d)),
    "q_price_bands" -> ((s, d) => graft.operators.StatsOps.monthlyPriceBands(s, d)),
    "q_asof_tolerance" -> ((s, d) => EventOps.lastViewWithin(s, d)),
    "q_ship_latency" -> ((s, d) => graft.operators.StatsOps.shipLatency(s, d)),
    "q_degree_dist" -> ((s, d) => graft.operators.GraphOps.degreeDistribution(s, d)),
    "q_half_coverage" -> ((s, d) => Relational.halfCoverage(s, d))
  )

  private[graft] def oracleSql: Map[String, String] = Map(
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
    // q_sketches: a from-first-principles HLL whose registers live in
    // exact integer arithmetic — the oracle replays the sketch itself.
    // (The engine-native HLL++/percentile_approx face stays test-pinned
    // — ITS internals are engine-specific by design.)
    "q_sketches" -> qSketchesSql,
    "q_pii_scrub" -> qPiiScrubSql,
    "q_mode_median" -> qModeMedianSql,
    "q_unpivot" -> qUnpivotSql,
    "q_corpus_diff" -> qCorpusDiffSql,
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
    "q_window_range_frame" -> qWindowRangeFrameSql,
    "q_kmv_distinct" -> qKmvDistinctSql,
    // q_skyline: the oracle states the DEFINITION (dominance NOT
    // EXISTS); the engine runs the agg+broadcast rewrite — matching
    // hashes prove the rewrite implements skyline semantics.
    "q_skyline" -> qSkylineSql,
    // q_labelprop: unrolled synchronous rounds, integer-packed argmax —
    // MATERIALIZED CTEs for the same reason as q_kcore.
    "q_labelprop" -> qLabelpropSql,
    // q_histogram: pure integer bucket arithmetic; the depth face's
    // global rank replays as a row_number window.
    "q_histogram" -> qHistogramSql,
    // q_asof_native: the custom AsOfJoinExec against the SAME oracle as
    // the window-based ev_asof — hash-equal results prove the operator.
    "q_asof_native" -> EventRegistry.evAsofSql,
    "q_dq_report" -> qDqReportSql,
    // q_asof_forward: the forward direction of the custom exec; oracle
    // is the mirrored FOLLOWING-window form over the same union.
    "q_asof_forward" -> qAsofForwardSql,
    // q_fuzzy_join: the oracle replays the FastSS deletion-neighborhood
    // blocking with STRING keys (hashing is a Spark-side narrowing that
    // provably cannot change the verified output) and the levenshtein
    // verify that defines the relation.
    "q_fuzzy_join" -> qFuzzyJoinSql,
    // q_fuzzy_join2: same FastSS replay at k=2 — string-keyed
    // 2-deletion neighborhood blocking, exact levenshtein <= 2 verify.
    "q_fuzzy_join2" -> qFuzzyJoin2Sql,
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
    // q_assoc_rules: all supports are exact integer counts; conf/lift
    // are IEEE divisions of exact integer products, and the top-100
    // order is total (lift DESC, a, b) so the cut is deterministic.
    "q_assoc_rules" -> qAssocRulesSql,
    // q_sssp: integer weights (1 + 100 DIV support) and integer cost
    // sums; fixed Bellman-Ford rounds unroll to min-union CTEs.
    "q_sssp" -> qSsspSql,
    // q_linreg: sufficient statistics are exact BIGINT sums; slope/
    // intercept/r2 replay as the SAME IEEE operation tree over them.
    "q_linreg" -> qLinregSql,
    // q_price_bands: doubled quantiles (lower+upper pair) — integer
    // cents, no fractions, same threshold rule in both engines.
    "q_price_bands" -> qPriceBandsSql,
    // q_asof_tolerance: the evAsof window form with the 30-minute band
    // applied to its pick — equivalent because the pick is the closest.
    "q_asof_tolerance" -> EventRegistry.evAsofToleranceSql,
    // q_ship_latency: exact integer day lags.
    "q_ship_latency" -> qShipLatencySql,
    // q_degree_dist: ⌊log₂⌋ from the binary-string length — integer-
    // exact buckets, no float log at power-of-two boundaries.
    "q_degree_dist" -> qDegreeDistSql,
    // q_half_coverage: integer cents; "needed" = coverage not reached
    // BEFORE the row (2·(cum−own) < total) — no halving, no floats.
    "q_half_coverage" -> qHalfCoverageSql
  )
}
