package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: attribute dedup_curated's cold cost to its stages by
  * timing each shared-cache build in dependency order, then the final
  * assembly, in one fresh session (driver-bench-like config). */
object CapstoneProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[cap] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.range(1000000).groupBy(expr("id % 100")).count().count() // JVM warm
    t("pairs (shingle caches + ngram PPJoin verify)") {
      graft.ext.DedupOps.ngramJaccardPairs(spark, dir).count()
    }
    t("cluster loop (CC label propagation)") {
      graft.ext.DedupOps.dedupClusters(spark, dir).count()
    }
    t("quality cache") {
      graft.ext.TextOps.qualityCached(spark, dir).count()
    }
    t("decontaminate") {
      graft.ext.DedupOps.decontaminate(spark, dir).count()
    }
    t("curated assembly (all caches warm)") {
      graft.ext.DedupOps.curatedCorpus(spark, dir).count()
    }
    t("curated second run") {
      graft.ext.DedupOps.curatedCorpus(spark, dir).count()
    }
    spark.stop()
  }
}
