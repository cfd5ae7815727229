package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-attribution probe for sim_lsh_topk: times the face's
  * sub-plans in isolation (signature-cache scan, candidate distinct,
  * verify join, full face) so the warm cost splits into real work vs
  * scheduling. Dev instrument, not part of any gate. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Any): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[lsh] $label #$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    // warm the shared caches exactly like a full bench run would
    graft.ext.SimilarityOps.lshTopK(spark, dir).count()
    t("full face") { graft.ext.SimilarityOps.lshTopK(spark, dir).count() }
    val (probes, candIds, sims, result) =
      graft.ext.SimilarityOps.lshParts(spark, dir)
    t("probes side") { probes.count() }
    t("candIds distinct") { candIds.count() }
    t("sims verify") { sims.count() }
    t("result window") { result.count() }
    println("[lsh] candIds rows: " + candIds.count())
    spark.stop()
  }
}
