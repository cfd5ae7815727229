package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfStages {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $name%-28s ${(System.nanoTime()-t0)/1e9}%.2f s  -> $r"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.DedupOps
    t("warmup")(spark.read.parquet(s"$dir/documents.parquet").limit(100).count())
    val docs = graft.model.Tables.documents(spark, dir)
      .repartition(16)
      .select(col("doc_id"), DedupOps.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist()
    t("shingle_cache")(docs.count())
    val hashed = docs.select(col("doc_id"),
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.HashStringArray(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("sh")))).as("hs"))
    val exploded = hashed.select(col("doc_id"), size(col("hs")).as("n_sh"), explode(col("hs")).as("shingle"))
    t("explode_count")(exploded.count())
    val dfreq = exploded.groupBy("shingle").agg(count(lit(1)).as("df"))
    t("dfreq")(dfreq.count())
    val ranked = exploded.join(dfreq, "shingle")
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
    val alpha = expr("(CAST(800000 AS BIGINT) * n_sh + 999999) DIV 1000000")
    val prefix = ranked.filter(col("r") <= col("n_sh") - alpha + 1)
      .select("doc_id", "shingle", "r", "n_sh").persist()
    t("prefix_index")(prefix.count())
    val plain = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    t("candidates_nofilter")(plain.count())
    val tN = 800000L
    val lengthOk =
      greatest(col("a.n_sh"), col("b.n_sh")).cast("long") * lit(tN) <=
        least(col("a.n_sh"), col("b.n_sh")).cast("long") * lit(1000000L)
    val positionOk =
      (lit(1L) + least(col("a.n_sh") - col("a.r"), col("b.n_sh") - col("b.r"))
        .cast("long")) * lit(1000000L + tN) >=
        (col("a.n_sh") + col("b.n_sh")).cast("long") * lit(tN)
    val candidates = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id") &&
          lengthOk && positionOk)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    t("candidates_ppjoin")(candidates.count())
    val hsTab = hashed.persist()
    val verified = candidates
      .join(hsTab.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), "doc_a")
      .join(hsTab.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
      .withColumn("common", size(array_intersect(col("hs_a"), col("hs_b"))))
      .withColumn("jaccard", round(col("common").cast("double") / (size(col("hs_a")) + size(col("hs_b")) - col("common")), 6))
      .filter(col("jaccard") >= 0.8)
    t("verified")(verified.count())
    // minhash md5 mode signature cost
    val sigs = docs.select(col("doc_id"), DedupOps.minhashSig("sh", 32, md5Mode = true).as("sig"))
    t("minhash_md5_sigs")(sigs.count())
    val sigs2 = docs.select(col("doc_id"), DedupOps.minhashSig("sh", 32, md5Mode = false).as("sig"))
    t("minhash_xx_sigs")(sigs2.count())
    t("full_lsh_md5")(DedupOps.minhashLshPairs(spark, dir, md5Mode = true).count())
    t("simhash_md5")(DedupOps.simhashPairs(spark, dir, md5Mode = true).count())
    spark.stop()
  }
}
