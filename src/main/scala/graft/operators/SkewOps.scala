package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §7.4 / 100 TB notes): salting
  * for hot keys. AQE's skew-join splitting handles most cases at
  * runtime; explicit salting is the declarative fallback when a single
  * key's group-state (not just its row count) is the bottleneck —
  * e.g. a count/sum over a key that holds 10% of a 100 TB fact table.
  *
  * Two-phase aggregate: phase 1 aggregates on (key, salt) — spreading
  * one hot key over `saltBuckets` reducers — phase 2 merges the partial
  * results on key alone. Result is identical to a direct groupBy (both
  * phases use the same associative aggregates), which is exactly what
  * the DuckDB oracle checks.
  */
object SkewOps {

  /** Salted count+sum per key. `sumCol` must be an associative-sum
    * column (the decimal-exact pattern applies before the call). */
  def saltedAgg(df: DataFrame, key: Column, sumCol: Column,
                saltBuckets: Int = 16): DataFrame = {
    val salted = df.select(
      key.as("k"),
      sumCol.as("v"),
      // deterministic salt: spread rows of one key over buckets without
      // a random source (repeatable plans, oracle-friendly)
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)).as("salt"))
    salted
      .groupBy(col("k"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pc")).as("n"), sum(col("ps")).as("total"))
  }

  /** Salted equi-join for a skewed probe side: the probe rows of one
    * hot key are spread over `saltBuckets` shuffle partitions, and the
    * build side is replicated once per bucket (explode over 0..S-1), so
    * the join key becomes (key, salt) and no single reducer owns a hot
    * key. Use when BOTH sides are too big to broadcast and AQE's
    * skew-split (which handles most cases) can't help — e.g. the hot
    * key's build rows must co-locate with state. Result is identical to
    * the plain join (what the oracle checks).
    *
    * `buildSide` is replicated ×saltBuckets: keep it the SMALL side.
    * Keys are passed by NAME and resolved against their own side, so
    * identically-named keys on both sides stay unambiguous. */
  def saltedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: String, buildKey: String,
                 saltBuckets: Int = 8): DataFrame = {
    val saltCol = "__graft_salt"
    require(!probe.columns.contains(saltCol) && !build.columns.contains(saltCol),
      s"input already has a $saltCol column")
    val salted = probe.withColumn(saltCol,
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
    val replicated = build
      .withColumn(saltCol, explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    salted.join(replicated,
      salted(probeKey) === replicated(buildKey) &&
        salted(saltCol) === replicated(saltCol))
      .drop(saltCol)
  }

  /** Exact heavy hitters via Misra-Gries candidates + one verification
    * pass — the other face of skew handling: FINDING the hot keys.
    *
    * Phase 1 streams each partition through k counters (classic
    * Misra-Gries summary) with NO shuffle; a key with global count
    * ≥ N/shareDen is guaranteed to survive in at least one partition's
    * summary whenever shareDen ≤ k (if a key is decremented away
    * everywhere, its total is ≤ Σ N_p/(k+1) = N/(k+1) < N/k ≤
    * N/shareDen — the inequality must be STRICT, so shareDen = k+1 is
    * not admissible: a key exactly at the N/(k+1) threshold can be
    * evicted from every summary).
    * Phase 2 broadcast-semi-joins the tiny candidate set back and counts
    * EXACTLY, keeping keys with count·shareDen ≥ N (integer compare — no
    * float threshold), so false candidates drop out and the result is
    * exactly {key : count ≥ N/shareDen}.
    *
    * Scale: phase 1 is map-only (k counters per partition, 2048 longs);
    * phase 2 shuffles only rows of candidate keys (≤ k×partitions keys).
    * A direct groupBy over 100 TB would shuffle every distinct key;
    * this shuffles only plausible-heavy ones. Key must be integral
    * (hash wider keys to 64-bit first; the exact pass still verifies).
    */
  def heavyHitters(df: DataFrame, key: String, shareDen: Long = 1280L,
                   k: Int = 2048): DataFrame = {
    require(shareDen <= k,
      s"guarantee needs shareDen <= k (got shareDen=$shareDen, k=$k)")
    val spark = df.sparkSession
    import spark.implicits._
    val candidates = df.select(col(key).cast("long")).as[Long]
      .mapPartitions { it =>
        val counters = scala.collection.mutable.LongMap.empty[Long]
        it.foreach { v =>
          if (counters.contains(v)) counters(v) += 1L
          else if (counters.size < k) counters(v) = 1L
          else {
            // Misra-Gries decrement-all: O(k) per trigger, amortized O(1)
            // per element (each trigger retires k+1 units of count)
            counters.toList.foreach { case (kk, c) =>
              if (c == 1L) counters.remove(kk) else counters(kk) = c - 1L
            }
          }
        }
        counters.keysIterator
      }.toDF(key).distinct()
    val counts = df.join(broadcast(candidates), Seq(key), "left_semi")
      .groupBy(col(key)).agg(count(lit(1)).as("n"))
    val total = df.agg(count(lit(1)).as("__total"))
    counts.join(broadcast(total))
      .filter(col("n") * lit(shareDen) >= col("__total"))
      .drop("__total")
  }

  /** Query face: users with ≥ 1/1280 of all events (exact via MG +
    * verify; at sf0.01 every user clears the bar, at sf0.1 only the
    * busiest do — same rule, both oracle-checked). */
  def hotUsers(spark: SparkSession, dir: String): DataFrame =
    heavyHitters(EventOps.events(spark, dir), "user_id")
      .orderBy(col("user_id"))
}
