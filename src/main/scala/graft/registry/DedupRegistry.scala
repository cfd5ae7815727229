package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{DedupOps, MultimodalOps, SampleOps, SimilarityOps, TextOps}
import graft.model.{Fixtures, Tables}
import graft.operators.{ChangeOps, EventOps, KubeOps, ListingOps, Relational, TimeOps}

/** deduplication [EXT] slice of the driver registry — split from the
  * monolithic SparkEntry (r14 judge #7). PURE move: faces, oracle SQL,
  * and registry entries are verbatim; SparkEntry composes the family
  * maps and RegistryOrderSpec pins that the composed registry's key
  * set AND iteration order are identical to the pre-split literal
  * (REGISTRY_ORDER.txt). */
private[graft] object DedupRegistry {

  private def sqlStr(s: String): String = CpFaces.sqlStr(s)


  private[graft] val dedupExactSql: String =
    """SELECT md5(text) AS h, count(*) AS n_docs, min(doc_id) AS keeper
      |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin


  /** Incremental-dedup replay: the Bloom prefilter is an optimization
    * that cannot change the answer (false positives are removed by the
    * exact verify join), so the oracle is the plain anti-join over the
    * same seeded-md5 batch/historical split. */
  private[graft] val dedupIncrementalSql: String =
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
  private[graft] val dedupNgramJaccardSql: String =
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
  private[graft] val dedupLshEvalSql: String =
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
  private[graft] val dedupMinhashLshSql: String =
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
  private[graft] val dedupIncrementalNearSql: String =
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
  private[graft] val dedupSimhashSql: String =
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
  private[graft] val dedupClusterCtes: String =
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
  private[graft] val dedupWeightsSql: String =
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


  private[graft] val dedupClustersSql: String =
    s"""$dedupClusterCtes
      |SELECT u AS doc_id, min(label) AS cluster,
      |       (u = min(label)) AS is_keeper
      |FROM walk GROUP BY u ORDER BY doc_id""".stripMargin


  private[graft] val dedupKeeperQualitySql: String =
    s"""$dedupClusterCtes,
      |cl AS (SELECT u AS doc_id, min(label) AS cluster FROM walk GROUP BY u),
      |qx AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS nt,
      |        CAST(len(list_distinct(t)) AS DOUBLE) AS nd,
      |        CAST(len(list_filter(t, y -> y IN ${TextRegistry.stopSet})) AS DOUBLE) AS ns
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


  /** Capstone curation oracle: quality gate + quality-keeper dedup +
    * 5-gram decontamination, composed from the same CTE chains the
    * individual oracles use. */
  private[graft] val dedupCuratedSql: String =
    s"""$dedupClusterCtes,
      |cl AS (SELECT u AS doc_id, min(label) AS cluster FROM walk GROUP BY u),
      |qx AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS nt,
      |        CAST(len(list_distinct(t)) AS DOUBLE) AS nd,
      |        CAST(len(list_filter(t, y -> y IN ${TextRegistry.stopSet})) AS DOUBLE) AS ns
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


  private[graft] val dedupPassagesSql: String = {
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
  private[graft] lazy val spanChainCtes: String = {
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


  private[graft] val dedupSpansSql: String =
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

  private[graft] def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, d) => DedupOps.exactDupGroups(s, d)),
    "dedup_incremental" -> ((s, d) => DedupOps.incrementalDedup(s, d)),
    "dedup_incremental_near" -> ((s, d) => DedupOps.incrementalNearDedup(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => DedupOps.ngramJaccardPairs(s, d)),
    "dedup_clusters" -> ((s, d) => DedupOps.dedupClusters(s, d)),
    "dedup_minhash_lsh" -> ((s, d) => DedupOps.minhashLshPairs(s, d, md5Mode = true)),
    "dedup_lsh_eval" -> ((s, d) => DedupOps.lshEval(s, d)),
    "dedup_simhash" -> ((s, d) => DedupOps.simhashPairs(s, d, md5Mode = true)),
    "dedup_decontaminate" -> ((s, d) => DedupOps.decontaminate(s, d)),
    "dedup_keeper_quality" -> ((s, d) => DedupOps.keeperByQuality(s, d)),
    "dedup_weights" -> ((s, d) => DedupOps.keeperWeights(s, d)),
    "dedup_curated" -> ((s, d) => DedupOps.curatedCorpus(s, d)),
    "dedup_passages" -> ((s, d) => graft.ext.DedupOps.passageDuplication(s, d)),
    "dedup_spans" -> ((s, d) => graft.ext.DedupOps.duplicatedSpans(s, d))
  )

  private[graft] def oracleSql: Map[String, String] = Map(
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
    // dedup_passages: shingle strings replay verbatim (the dedup_ngram
    // tokenizer CTE with n=8); counts exact, frac one IEEE division.
    "dedup_passages" -> dedupPassagesSql,
    "dedup_spans" -> dedupSpansSql
  )
}
