package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Local measurement aid for the q_fuzzy_join2 build (guide §1/§2.5):
  * stage-times the FastSS d=2 chain — index explode, candidate
  * self-join cardinality, verify, distinct — and prints the per-key and
  * per-partition skew of the deletion-key index so a hot-key straggler
  * is visible instead of inferred from build-time variance.
  *
  * Usage: runMain graft.tools.Fastss2Probe <sfDir>
  */
object Fastss2Probe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[fastss2] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  -> $r")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val c = graft.model.Tables.customer(spark, dir)
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    t("customer_count")(c.count())
    val keyed = c.select(col("id"), col("name"), explode(expr(
      """array_distinct(transform(concat(
        |  transform(sequence(0, length(name)),
        |    i -> CASE WHEN i = 0 THEN name
        |      ELSE concat(substring(name, 1, i - 1),
        |                  substring(name, i + 1)) END),
        |  CASE WHEN length(name) >= 2 THEN
        |    flatten(transform(sequence(1, length(name) - 1), i ->
        |      transform(sequence(i + 1, length(name)), j ->
        |        concat(substring(name, 1, i - 1),
        |               substring(name, i + 1, j - i - 1),
        |               substring(name, j + 1)))))
        |  ELSE CAST(array() AS ARRAY<STRING>) END),
        |  s -> xxhash64(s)))""".stripMargin)).as("k"))
    t("index_rows")(keyed.count())
    val parted = keyed.repartition(col("k")).persist()
    t("index_persist")(parted.count())
    // per-partition skew of the persisted layout
    val sizes = parted.rdd.mapPartitions(it => Iterator(it.size)).collect()
    println(s"[fastss2] partition rows: min=${sizes.min} " +
      s"med=${sizes.sorted.apply(sizes.length / 2)} max=${sizes.max}")
    // hottest deletion keys → join fan-out is sum over keys of n_k^2/2
    val hot = parted.groupBy(col("k")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(10).collect()
    println(s"[fastss2] hottest keys: ${hot.map(_.getLong(1)).mkString(", ")}")
    val quad = parted.groupBy(col("k")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * (col("n") - 1) / 2)).collect()(0)
    println(s"[fastss2] candidate pairs (ordered, incl self-id): $quad")
    val joined = parted.as("a").join(parted.as("b"),
      col("a.k") === col("b.k") && col("a.id") < col("b.id"))
    t("join_count")(joined.count())
    val verified = joined.filter(ColumnBridge.column(
      graft.functions.EditWithin2(
        ColumnBridge.expression(col("a.name")),
        ColumnBridge.expression(col("b.name")))))
      .select(col("a.id").as("a"), col("b.id").as("b"))
    t("verify_count")(verified.count())
    t("distinct_count")(verified.distinct().count())
    // packed-long variant: one 8-byte group key instead of two columns
    val packed = joined.filter(ColumnBridge.column(
      graft.functions.EditWithin2(
        ColumnBridge.expression(col("a.name")),
        ColumnBridge.expression(col("b.name")))))
      .select((col("a.id") * lit(4294967296L) + col("b.id")).as("ab"))
      .distinct()
      .select(expr("ab DIV 4294967296L").as("a"),
        pmod(col("ab"), lit(4294967296L)).as("b"))
    t("packed_distinct")(packed.count())
    t("packed_distinct2")(packed.count())
    t("distinct_count2")(verified.distinct().count())
    parted.unpersist(true)
    // end-to-end A/B of the whole build: persisted pre-partitioned
    // index vs un-persisted self-join (identical exchange subtrees →
    // ReusedExchange materializes the shuffle once, no storage cost)
    def fullBuild(persist: Boolean): Long = {
      val idx = if (persist) {
        val p = keyed.repartition(col("k")).persist(); p.count(); p
      } else keyed.repartition(col("k"))
      val pairs = idx.as("a").join(idx.as("b"),
          col("a.k") === col("b.k") && col("a.id") < col("b.id"))
        .filter(ColumnBridge.column(
          graft.functions.EditWithin2(
            ColumnBridge.expression(col("a.name")),
            ColumnBridge.expression(col("b.name")))))
        .select(col("a.id").as("a"), col("b.id").as("b"))
        .distinct()
      val n = pairs.count()
      if (persist) idx.unpersist(true)
      n
    }
    t("full_build_persisted")(fullBuild(true))
    t("full_build_reused")(fullBuild(false))
    t("full_build_persisted2")(fullBuild(true))
    t("full_build_reused2")(fullBuild(false))
    spark.stop()
  }
}
