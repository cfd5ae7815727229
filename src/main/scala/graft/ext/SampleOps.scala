package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Corpus-construction operators for a training-data pipeline: weighted
  * stratified sampling (data mixing) and fixed-budget sequence packing.
  * Both are deterministic — sampling decisions derive from a seeded hash
  * of the row key, packing from a total order — so reruns, retries and
  * cross-engine oracles all agree bit-for-bit.
  */
object SampleOps {

  /** Deterministic hash-based stratified sampling: a row is kept iff the
    * first 4 hex chars of md5(seed ":" key) fall below the stratum's
    * threshold, where threshold = floor(rate * 16^4) rendered as a
    * 4-digit hex string. This is the data-mixing primitive: the rate map
    * is the mixture weight per stratum (language, source domain, ...).
    *
    * Scale: no shuffle at all — the rates table is broadcast and the
    * filter is a per-row hash, so the operator is a narrow map over the
    * scan and composes with predicate pushdown on the stratum column.
    * md5 hex is lowercase in every engine, which makes the decision
    * reproducible outside Spark (the DuckDB oracle replays it exactly).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      rates: Map[String, Double], seed: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      s"rates must be in [0,1]: $rates")
    val thresholds = rates.toSeq.sorted
      .map { case (s, r) => (s, f"${math.floor(r * 65536).toInt}%04x") }
      .toDF(strataCol, "thresh")
    df.join(broadcast(thresholds), strataCol)
      .filter(substring(md5(concat(lit(seed + ":"), col(keyCol).cast("string"))),
        1, 4) < col("thresh"))
      .drop("thresh")
  }

  /** The `text_sample` query face: mix the document corpus by language
    * with fixed weights — the "sample 50% of English, 25% of German, ..."
    * recipe used to rebalance a pretraining mixture. */
  val mixtureRates: Map[String, Double] = Map(
    "en" -> 0.5, "de" -> 0.25, "es" -> 0.25, "fr" -> 0.125, "zh" -> 0.0625)
  val mixtureSeed = "graft-mix-v1"

  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    stratifiedSample(docs, "lang", "doc_id", mixtureRates, mixtureSeed)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  val temperatureBudget = 250L
  val temperatureSeed = "graft-temp-v1"

  /** Temperature-based mixture sampling (`samp_temperature`): sampling
    * rates derived FROM the corpus rather than hand-set — each
    * language's share is ∝ n^α with α = 1/2 (the GPT-3-style
    * temperature that upsamples tail languages relative to
    * proportional sampling), targeting [[temperatureBudget]] docs.
    *
    * Engine-exact float discipline: per-stratum √n is floored to a
    * 2²⁰-scaled integer (floor of a correctly-rounded IEEE sqrt —
    * deterministic everywhere), so the normalizer Σ⌊√n·2²⁰⌋ is an
    * EXACT integer sum (a float Σ√n would be addition-order-
    * dependent); each rate is then ONE IEEE division of exact integer
    * products, and the keep test compares the md5-60 of the doc id
    * against ⌊rate·2⁶⁰⌋. The stratum table is strata-sized (tiny);
    * the corpus is touched by exactly one scan + broadcast join —
    * the stratifiedSample shape with data-derived rates. */
  def temperatureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val strata = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .withColumn("isq",
        expr("CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1048576) AS BIGINT)"))
    val norm = strata.agg(sum(col("isq")).as("s"))
    val rates = strata.crossJoin(broadcast(norm))
      .withColumn("rate", least(lit(1.0),
        (lit(temperatureBudget) * col("isq")).cast("double") /
          (col("s") * col("n")).cast("double")))
      .select(col("lang"), col("n").as("n_lang"),
        floor(col("rate") * lit(1152921504606846976L)).as("thresh"))
    docs.join(broadcast(rates), "lang")
      .filter(conv(substring(md5(concat(lit(temperatureSeed + ":"),
        col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long") <
        col("thresh"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_lang"))
      .orderBy(col("doc_id"))
  }

  /** GPT-style sequence packing: concatenate each language's token
    * stream in doc_id order and split it into fixed `budget`-token
    * training sequences. A document is assigned the bin range
    * [bin_first, bin_last] its tokens land in; `straddles` marks
    * documents split across a sequence boundary.
    *
    * Scale: one running-sum window per language partition — fine while
    * every language fits a single task's sort. At 100 TB, swap the
    * window for the two-pass trick already used by
    * Relational.balanceQuartiles: repartitionByRange(lang, doc_id),
    * per-partition token totals collected once, then each partition
    * computes exact global offsets locally (offsets are just a running
    * sum of ~hundreds of partition totals). Output is identical.
    */
  def packSequences(spark: SparkSession, dir: String, budget: Int = 256): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val docs = Tables.documents(spark, dir)
    val nTok = size(TextOps.tokens(col("text"))).cast("long")
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    docs.select(col("doc_id"), col("lang"), nTok.as("n_tokens"))
      .withColumn("end_off", sum(col("n_tokens")).over(w))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
      .withColumn("bin_first", floor(col("start_off") / budget))
      .withColumn("bin_last", floor((col("end_off") - 1) / budget))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("start_off"),
        col("bin_first"), col("bin_last"),
        (col("bin_first") =!= col("bin_last")).as("straddles"))
      .orderBy(col("doc_id"))
  }

  val quotaSeed = "graft-quota-v1"

  /** Exact-count quota sampling (`samp_quota`): exactly `min(k, |stratum|)`
    * rows per stratum, chosen as the k SMALLEST seeded hashes — a
    * deterministic uniform without-replacement sample per group. This is
    * the "exactly 1M docs per language" rebalancing primitive that
    * rate-based [[stratifiedSample]] can't give (rates only hit quotas in
    * expectation).
    *
    * Runs on the custom TopKPerGroup physical operator
    * (graft.plans.TopKPerGroup): one ClusteredDistribution exchange on
    * the stratum and a k-bounded heap per group — no Sort, no Window,
    * per-task memory O(k), which is the shape that survives a stratum
    * with 10¹⁰ members. The md5 priority gives the same sample in any
    * engine, so the DuckDB oracle replays it with a row_number window.
    */
  def quotaSample(df: DataFrame, strataCol: String, keyCol: String,
      k: Int, seed: String): DataFrame = {
    val pri = md5(concat(lit(seed + ":"), col(keyCol).cast("string")))
    graft.plans.TopKPerGroup.topK(
        df.withColumn("pri", pri), Seq(strataCol),
        Seq(("pri", true), (keyCol, true)), k)
      .drop("rank")
  }

  /** The `samp_quota` query face: 25 documents per language. */
  def quotaByLang(spark: SparkSession, dir: String, k: Int = 25): DataFrame = {
    quotaSample(Tables.documents(spark, dir), "lang", "doc_id", k, quotaSeed)
      .select(col("lang"), col("doc_id"), col("pri"), col("source"))
      .orderBy(col("lang"), col("pri"), col("doc_id"))
  }

  val splitSeed = "graft-split-v1"
  // hex thresholds on the first 16 bits of md5(seed ":" key):
  // train < 0xcccc (52428/65536 ≈ 0.8), val < 0xe666 (≈ 0.9), else test
  val splitTrainHex = f"${math.floor(0.8 * 65536).toInt}%04x"
  val splitValHex = f"${math.floor(0.9 * 65536).toInt}%04x"

  /** Deterministic train/val/test assignment (`samp_split`): the split
    * is a pure function of the row KEY — md5(seed ":" key) bucketed
    * 80/10/10 — never of position, partition, or time. That is the
    * property a training pipeline actually needs: re-runs, backfills
    * and incremental arrivals all land each document in the same split,
    * so eval rows can never leak into training when the corpus is
    * rebuilt. Changing the seed resplits; changing the rates moves only
    * the boundary documents.
    *
    * Scale: zero shuffle — a per-row hash compare over the scan (the
    * same narrow-map recipe as [[stratifiedSample]]), composing with
    * pushdown and partitioned writes (`partitionBy("split")` gives the
    * three corpora as separate file trees in the same pass). */
  def trainValTestSplit(df: DataFrame, keyCol: String,
      seed: String = splitSeed): DataFrame = {
    val h = substring(md5(concat(lit(seed + ":"), col(keyCol).cast("string"))), 1, 4)
    df.withColumn("split",
      when(h < lit(splitTrainHex), "train")
        .when(h < lit(splitValHex), "val")
        .otherwise("test"))
  }

  /** The `samp_split` query face: per-(split, lang) corpus accounting —
    * row counts and total characters, the sanity table checked before
    * any training run. */
  def corpusSplit(spark: SparkSession, dir: String): DataFrame = {
    trainValTestSplit(Tables.documents(spark, dir), "doc_id")
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("split"), col("lang"))
  }

  /** Leakage-safe train/val/test assignment (`samp_split_leakfree`):
    * the split is a pure function of the document's NEAR-DUP CLUSTER,
    * not the document itself. Per-doc hash splits ([[trainValTestSplit]])
    * have a known failure mode in LLM corpora: near-identical documents
    * hash independently, so one copy lands in train and its twin in
    * test — silent eval contamination. Here every member of a dedup
    * cluster shares its cluster's key (the min doc_id label from
    * [[graft.ext.DedupOps.dedupClusters]]; unclustered docs key on
    * themselves), so a cluster can never straddle a split boundary —
    * the grouped-split discipline decontamination papers prescribe.
    *
    * Scale: the cluster labels come from the banded near-dup pair set
    * (pair-table-sized, ≪ corpus) and join back to the corpus as one
    * AQE-broadcast join; the hash compare itself is a narrow map. The
    * label table is the same memoized artifact the dedup family shares,
    * so the marginal cost over [[trainValTestSplit]] is one small join. */
  def leakFreeSplit(spark: SparkSession, dir: String,
                    seed: String = splitSeed): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"))
    val clusters = graft.ext.DedupOps.dedupClusters(spark, dir)
      .select(col("doc_id"), col("cluster"))
    val keyed = docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_key", coalesce(col("cluster"), col("doc_id")))
    trainValTestSplit(keyed, "cluster_key", seed)
      .select(col("doc_id"), col("cluster_key"), col("split"))
      .orderBy(col("doc_id"))
  }

  val ppsN = 100

  /** Systematic probability-proportional-to-size sampling (`samp_pps`):
    * lay the documents out on a line where each occupies a segment of
    * length = its weight (n_chars), then take `n` equally spaced
    * targets t_j = j·W/n — a document is drawn once per target inside
    * its segment, so its expected draw count is exactly n·w/W (big
    * documents can be drawn more than once; `hits` is the multiplicity
    * and Σhits = n exactly). This is the weighted counterpart of the
    * mixture/quota samplers: sampling ∝ size is how token-weighted
    * corpus mixing is actually done.
    *
    * Everything is integer arithmetic — hits = ⌊n·cum/W⌋ −
    * ⌊n·(cum−w)/W⌋ over exact char-count prefix sums — so the draw
    * replays bit-for-bit in any engine (no float inverse-CDF anywhere).
    *
    * Scale shape: the global prefix sum does NOT use a global-window
    * sort. repartitionByRange(doc_id) + in-partition sort, a
    * mapPartitions running sum (genuinely per-partition-imperative —
    * the one place the RDD-ish escape hatch is the right tool), then
    * per-partition totals (P rows) broadcast back as offsets: zero
    * exchanges beyond the range partitioning itself, the same recipe as
    * Relational.withGlobalRank but carrying a SUM instead of a count. */
  def ppsSample(spark: SparkSession, dir: String, n: Int = ppsN): DataFrame =
    ppsDraw(Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), col("n_chars")),
      n, tagName = "lang", wName = "n_chars")
      .orderBy(col("doc_id"))

  /** The shared systematic-PPS core: `rows` = (doc_id, <tag>, <w>);
    * one draw per equally spaced target on the weight line, hits by
    * exact integer prefix-sum arithmetic. Consumed by [[ppsSample]]
    * (w = n_chars: token-weighted corpus mixing) and [[dsirResample]]
    * (w = the DSIR importance score: importance RESAMPLING). Zero-
    * weight rows occupy empty segments and can never be drawn. */
  private[graft] def ppsDraw(rows: DataFrame, n: Int,
                             tagName: String, wName: String): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    // full parallelism, never capped: the per-partition-totals step is
    // O(P) rows in one task, trivially fine at any real cluster's P
    val parts = math.max(1, spark.sparkContext.defaultParallelism)
    val ranged = rows
      .select(col("doc_id"), col(tagName).cast("string").as("tag"),
        col(wName).cast("long").as("w"))
      .repartitionByRange(parts, col("doc_id").asc)
      .sortWithinPartitions(col("doc_id").asc)
      .withColumn("pid", spark_partition_id().cast("long"))
      .as[(Long, String, Long, Long)]
    // localCheckpoint: the running sum is partition-position-derived and
    // this table is consumed by TWO plans (the offsets aggregate and the
    // final join). The round-9 materialization rule (STATUS "Global-rank
    // determinism", the withGlobalRank precedent at Relational.scala)
    // requires pinning one layout so both consumers see the same pids.
    val withLocal = ranged.mapPartitions { it =>
      var s = 0L
      it.map { case (id, tag, w, pid) => s += w; (id, tag, w, pid, s) }
    }.toDF("doc_id", "tag", "w", "pid", "local_cum")
      .localCheckpoint()
    // per-partition totals -> exclusive offsets (P rows; the only
    // single-partition step in the plan) and the grand total W
    val cumW = Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offs = withLocal.groupBy(col("pid")).agg(sum(col("w")).as("t"))
      .withColumn("off", coalesce(sum(col("t")).over(cumW), lit(0L)))
      .withColumn("w_total", sum(col("t")).over(Window.partitionBy()))
      .select(col("pid"), col("off"), col("w_total"))
    withLocal.join(broadcast(offs), "pid")
      .withColumn("cum", col("off") + col("local_cum"))
      // DIV, not `/`: float division + truncation can round a just-below-
      // integer quotient up; DIV is exact long arithmetic in both engines
      .withColumn("hits", expr(
        s"(${n}L * cum) DIV w_total - (${n}L * (cum - w)) DIV w_total"))
      .filter(col("hits") > 0)
      .select(col("doc_id"), col("tag").as(tagName), col("w").as(wName),
        col("cum"), col("hits"))
  }

  val dsirSampleN = 100

  /** DSIR importance RESAMPLING (`samp_dsir`): the second half of Xie
    * et al. 2023 — draw the training set with probability proportional
    * to the learned importance weight ([[TextOps.dsirScores]]'
    * score_micro), via the same systematic-PPS line as `samp_pps`.
    * `hits` is the multiplicity a repetition-tolerant data order
    * consumes; Σhits = n exactly; zero-token documents have weight 0
    * and can never be drawn. Expected draw count per doc = n·w/W — the
    * importance-resampling estimator, with the whole draw replaying
    * bit-for-bit cross-engine (exact integer prefix sums). */
  def dsirResample(spark: SparkSession, dir: String,
                   n: Int = dsirSampleN): DataFrame =
    ppsDraw(graft.ext.TextOps.dsirScoresUnsorted(spark, dir)
        .select(col("doc_id"), col("source"), col("score_micro")),
      n, tagName = "source", wName = "score_micro")
      .orderBy(col("doc_id"))

  val tokenBudgetPerSource = 3000L
  val tokenBudgetSeed = "graft-budget-v1"

  /** Token-budget corpus mixing (`samp_token_budget`): take documents
    * per SOURCE, in seeded-hash priority order, until each source's
    * running token count reaches its budget — the operation that turns
    * "the mixture spec says 50 B tokens of web, 10 B of code" into an
    * actual document set. Hash priority (md5(seed ":" doc_id)) makes
    * the selection a pure function of the key: re-runs, backfills and
    * per-source reprocessing reproduce the same mix, and raising a
    * budget only APPENDS documents (the prefix property — the mix you
    * trained on stays a prefix of the bigger mix).
    *
    * Scale shape: the per-source running sum does NOT use one window
    * task per source (a source with half the corpus would serialize).
    * Same recipe as [[ppsSample]], grouped: repartitionByRange on
    * (source, priority) + in-partition running sums that reset at
    * source boundaries (ranges are contiguous, so a partition sees each
    * source as one run), then per-(source, partition) totals — a tiny
    * P·S-row table — turned into exclusive offsets and broadcast back.
    * Zero extra exchanges beyond the range partitioning; the budget
    * filter then prunes BEFORE any downstream shuffle. */
  def tokenBudgetMix(spark: SparkSession, dir: String,
                     budget: Long = tokenBudgetPerSource,
                     seed: String = tokenBudgetSeed): DataFrame =
    tokenBudgetOver(spark,
      Tables.documents(spark, dir).select(col("source"), col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens")),
      budget, seed)

  /** The budget-fill core over any (source, doc_id, n_tokens) base —
    * shared by [[tokenBudgetMix]] (whole corpus) and
    * [[trainingMix]] (keepers ∩ leak-free train). */
  private[graft] def tokenBudgetOver(spark: SparkSession, baseDf: DataFrame,
                                     budget: Long, seed: String): DataFrame = {
    import spark.implicits._
    val parts = math.max(1, spark.sparkContext.defaultParallelism)
    val base = baseDf
      .select(col("source"), col("doc_id"), col("n_tokens"),
        md5(concat(lit(seed + ":"), col("doc_id").cast("string"))).as("pri"))
    val ranged = base
      .repartitionByRange(parts, col("source").asc, col("pri").asc,
        col("doc_id").asc)
      .sortWithinPartitions(col("source").asc, col("pri").asc,
        col("doc_id").asc)
      .withColumn("pid", spark_partition_id().cast("long"))
      .as[(String, Long, Long, String, Long)]
    val withLocal = ranged.mapPartitions { it =>
      var curSrc: String = null
      var s = 0L
      it.map { case (src, id, w, _, pid) =>
        if (src != curSrc) { curSrc = src; s = 0L }
        s += w
        (src, id, w, pid, s)
      }
    }.toDF("source", "doc_id", "n_tokens", "pid", "local_cum")
      // localCheckpoint (round-9 materialization rule): trainingMix feeds
      // this an AQE-layout-unstable anti-join ∩ semi-join base, and the
      // pid-derived running sum is consumed by BOTH the offsets aggregate
      // and the final join — without pinning, the two executions can
      // repartition differently and cum_tokens silently misattributes
      // (the exact failure shape of the r9 ev_rfm misrank).
      .localCheckpoint()
    val offW = Window.partitionBy(col("source")).orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = withLocal.groupBy(col("source"), col("pid"))
      .agg(sum(col("n_tokens")).as("t"))
      .withColumn("off", coalesce(sum(col("t")).over(offW), lit(0L)))
      .select(col("source"), col("pid"), col("off"))
    withLocal.join(broadcast(offs), Seq("source", "pid"))
      .withColumn("cum_tokens", col("off") + col("local_cum"))
      .filter(col("cum_tokens") <= budget)
      .select(col("source"), col("doc_id"), col("n_tokens"),
        col("cum_tokens"))
      .orderBy(col("source"), col("cum_tokens"))
  }

  /** Training-mix capstone (`samp_training_mix`) — the end-to-end
    * "build the training set" rule a corpus pipeline runs after
    * curation: drop near-dup losers (keepers only), keep only the
    * LEAK-FREE train split (cluster-keyed, so no test twin of any
    * training doc exists), then fill each source's token budget in
    * hash priority order. Every stage is a pure function of keys, so
    * the whole mix is reproducible and SQL-oracle-checkable — the
    * sampling-side counterpart of the dedup_curated capstone.
    *
    * Scale: the cluster-label artifact is shared (memoized) across the
    * dedup/split faces; the two admission joins are pair-table-sized
    * broadcasts; the budget fill is the [[tokenBudgetOver]] recipe. The
    * corpus text itself never shuffles. */
  def trainingMix(spark: SparkSession, dir: String,
                  budget: Long = tokenBudgetPerSource,
                  seed: String = tokenBudgetSeed): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    val losers = graft.ext.DedupOps.dedupClusters(spark, dir)
      .filter(!col("is_keeper")).select(col("doc_id"))
    val train = leakFreeSplit(spark, dir)
      .filter(col("split") === "train").select(col("doc_id"))
    val base = docs
      .join(losers, Seq("doc_id"), "left_anti")
      .join(train, Seq("doc_id"), "left_semi")
    tokenBudgetOver(spark, base, budget, seed)
  }

  val shardCount = 8

  /** `samp_shards`: balanced training-shard assignment — write-time
    * sharding where each output shard should carry a near-equal
    * character (≈ token) budget, not just an equal row count. Documents
    * take a global size rank (n_chars desc, doc_id tiebreak ⇒ total
    * order) and shard `(rank-1) mod S` — round-robin by size rank, the
    * distributed form of the LPT balancing heuristic: every shard
    * receives one document from each consecutive size stratum, so
    * shard totals differ by at most one stratum's spread.
    *
    * Scale shape: the rank rides `withGlobalRank` (range exchange +
    * P-row broadcast offsets — no one-task window); the shard roll-up
    * is a tiny S-row aggregate. Output is the accounting table a
    * pipeline checks before writing shards: per-shard doc count, char
    * total, and the share of the corpus. */
  def shardAssignment(spark: SparkSession, dir: String,
                      nShards: Int = shardCount): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    graft.operators.Relational
      .withGlobalRank(docs, Seq(col("n_chars").desc, col("doc_id").asc))
      .withColumn("shard", (col("rn") - 1) % nShards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .withColumn("share", round(col("sum_chars").cast("double") /
        sum(col("sum_chars")).over(Window.partitionBy()), 6))
      .orderBy(col("shard"))
  }
}
