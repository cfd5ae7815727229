package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{DedupOps, MultimodalOps, SampleOps, SimilarityOps, TextOps}
import graft.model.{Fixtures, Tables}
import graft.operators.{ChangeOps, EventOps, KubeOps, ListingOps, Relational, TimeOps}

/** text analysis / BPE / classifier / DSIR [EXT] slice of the driver registry — split from the
  * monolithic SparkEntry (r14 judge #7). PURE move: faces, oracle SQL,
  * and registry entries are verbatim; SparkEntry composes the family
  * maps and RegistryOrderSpec pins that the composed registry's key
  * set AND iteration order are identical to the pre-split literal
  * (REGISTRY_ORDER.txt). */
private[graft] object TextRegistry {

  private def sqlStr(s: String): String = CpFaces.sqlStr(s)


  // ==========================================================================
  // LLM-data ops [EXT] oracle SQL (text / dedup / similarity / multimodal)
  // ==========================================================================

  private[graft] val stopSet = TextOps.stopwords.map(sqlStr).mkString("(", ", ", ")")


  private[graft] val textStatsSql: String =
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


  private[graft] val textQualitySql: String =
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
  private[graft] val textPretrainCorpusSql: String = {
    val wf = s"w${TextOps.lrRounds}t"
    val zExpr = lrZExprSql("w")
    s"""WITH $lrChainCtes,
       |${DedupRegistry.spanChainCtes},
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
  private[graft] lazy val sampDsirSql: String = {
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


  private[graft] val textCollocationsSql: String = {
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
  private[graft] val textCorpusCardSql: String =
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
  private[graft] def lrZExprSql(w: String): String =
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


  private[graft] val textQualityLrSql: String = {
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


  private[graft] val textQualityLrWeightsSql: String = {
    val wf = s"w${TextOps.lrRounds}t"
    s"""WITH $lrChainCtes
       |SELECT feature, w_micro FROM (
       |  SELECT 'bias' AS feature, w0 AS w_micro FROM $wf
       |  UNION ALL SELECT 'len_norm', w3 FROM $wf
       |  UNION ALL SELECT 'stopword_ratio', w1 FROM $wf
       |  UNION ALL SELECT 'ttr', w2 FROM $wf) u
       |ORDER BY feature""".stripMargin
  }


  private[graft] val textLangIdSql: String = {
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


  private[graft] val textFingerprintSql: String =
    """SELECT doc_id,
      |  md5(array_to_string(list_sort(list_distinct(
      |    string_split_regex(trim(text), '\s+'))), ' ')) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin


  /** Gopher-style repetition signals: per-row duplicate-trigram fraction
    * plus an explode→count→max replay of the top-bigram share. */
  private[graft] val textRepetitionSql: String =
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
  private[graft] val textSampleSql: String = {
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
  private[graft] val textPackSql: String =
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
  private[graft] val textChunksSql: String =
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
  private[graft] val textBoilerplateSql: String =
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
  private[graft] val textDriftSql: String = {
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
  private[graft] val textVocabCoverageSql: String =
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
  private[graft] val bpeWordsCte: String =
    """w AS (SELECT w, CAST(count(*) AS BIGINT) AS freq
      |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
      |        FROM documents) t
      |  WHERE len(w) > 0 AND NOT contains(w, chr(31))
      |  GROUP BY w)""".stripMargin


  /** Replay of TextOps.bpePairs: within-word adjacent character pairs
    * weighted by word frequency; top-20 under the (n desc, pair asc)
    * total order. substr/substring are character-based in both
    * engines. */
  private[graft] val textBpePairsSql: String =
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
  private[graft] val bpeChainCtes: String = {
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


  private[graft] val textBpeMergesSql: String =
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
  private[graft] val textBpeFertilitySql: String =
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
  private[graft] val textBpeCurveSql: String = {
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
  private[graft] val textBpeTokensSql: String =
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


  /** Bigram-LM quality score replay: identical integer construction —
    * add-one-smoothed (c_ab+1)/(c_a+V) quantized by EXACT integer
    * division to the 2⁻²⁰ grid, per-doc exact integer sum, one final
    * IEEE division — so the score hash-matches bit-for-bit (no libm
    * ln() anywhere; parallel unnest zips the head/tail lists). */
  private[graft] val textLmScoreSql: String =
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
  private[graft] val textNoveltySql: String =
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


  private[graft] val textTopTermsSql: String = {
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

  private[graft] def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    "text_tfidf" -> ((s, d) => TextOps.tfIdfTopTerms(s, d)),
    "text_inverted" -> ((s, d) => TextOps.invertedIndex(s, d))
  )

  private[graft] def oracleSql: Map[String, String] = Map(
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
        |WHERE df BETWEEN 3 AND 20 ORDER BY phrase""".stripMargin
  )
}
