package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
