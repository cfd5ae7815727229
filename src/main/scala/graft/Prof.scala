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
    t("warmup")(spark.read.parquet(s"$dir/lineitem.parquet").limit(1000).count())
    t("clusters_cold")(graft.ext.DedupOps.dedupClusters(spark, dir).count())
    t("ngram_pairs_cached")(graft.ext.DedupOps.ngramJaccardPairs(spark, dir).count())
    t("ivf_topk_cold")(graft.ext.SimilarityOps.ivfTopK(spark, dir).count())
    t("ivf_fullprobe")(graft.ext.SimilarityOps.ivfTopK(spark, dir, nCentroids = 16, nProbe = 16).count())
    spark.stop()
  }
}
