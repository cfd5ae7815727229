package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract): times the
  * k-core peel loop repeatedly on warm caches so barrier-pacing changes
  * can be attributed without a full GraphProbe run. */
object KcoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    t("graph build") {
      val (e, d) = graft.operators.GraphOps.coGraph(spark, sfDir)
      e.count(); d.count()
    }
    for (i <- 1 to 4)
      t(s"kcore run $i") {
        graft.operators.GraphOps.kCorePeel(spark, sfDir).collect()
      }
    for (i <- 1 to 4)
      t(s"triangles run $i") {
        graft.operators.GraphOps.triangleCount(spark, sfDir).collect()
      }
    graft.ext.DedupOps.releaseShared()
    spark.stop()
  }
}
