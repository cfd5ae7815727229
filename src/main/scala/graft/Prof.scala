package graft
import org.apache.spark.sql.SparkSession
object Prof {
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
    import graft.ext.{DedupOps, TextOps}
    t("warmup")(spark.read.parquet(s"$dir/lineitem.parquet").limit(1000).count())
    if (args.headOption.contains("tri")) {
      t("triangles_cold")(graft.operators.GraphOps.triangleCount(spark, dir)
        .collect().toSeq)
      t("triangles_warm")(graft.operators.GraphOps.triangleCount(spark, dir)
        .collect().toSeq)
    } else if (args.headOption.contains("kcore")) {
      t("kcore_cold")(graft.operators.GraphOps.kCorePeel(spark, dir)
        .collect().toSeq)
      t("kcore_warm")(graft.operators.GraphOps.kCorePeel(spark, dir)
        .collect().toSeq)
    } else if (args.headOption.contains("cold")) {
      // the bench-order view: curated first absorbs the whole pipeline
      t("curated_cold")(DedupOps.curatedCorpus(spark, dir).count())
      t("clusters_warm")(DedupOps.dedupClusters(spark, dir).count())
      t("decontaminate_warm")(DedupOps.decontaminate(spark, dir).count())
    } else {
      t("quality")(TextOps.qualityScore(spark, dir).count())
      t("pairs_cold")(DedupOps.ngramJaccardPairs(spark, dir).count())
      t("clusters_loop")(DedupOps.dedupClusters(spark, dir).count())
      t("keeper_quality")(DedupOps.keeperByQuality(spark, dir).count())
      t("decontaminate")(DedupOps.decontaminate(spark, dir).count())
      t("curated_warm")(DedupOps.curatedCorpus(spark, dir).count())
    }
    spark.stop()
  }
}
