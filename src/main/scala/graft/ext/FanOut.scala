package graft.ext

import org.apache.spark.sql.DataFrame

/** Partitioning policy for the ext family's document/embedding scans.
  *
  * The local fixtures are single parquet files, so a bare scan plans as
  * 1–2 splits and every per-row kernel (shingling, hashing, cosine)
  * serializes onto a couple of cores. A real 100 TB table has the
  * opposite shape: thousands of splits, far more than the cluster's
  * core count. The policy therefore fans a narrow scan out to the FULL
  * `defaultParallelism` and leaves an already-wide scan untouched — it
  * never caps below the cluster's parallelism (a fixed `min(dp, 16)`
  * cap would funnel a 1000-core cluster's entire dedup/similarity/
  * multimodal family through 16 tasks).
  */
object FanOut {
  /** Repartition `df` up to `defaultParallelism` iff its scan planned
    * fewer splits than that; otherwise return it unchanged (no
    * gratuitous shuffle on a wide scan). `getNumPartitions` only plans
    * the query — no job runs; all call sites are exchange-free
    * scan+filter/select plans, so this is listing-cost only. */
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
