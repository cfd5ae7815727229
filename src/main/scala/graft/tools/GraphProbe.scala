package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract): times each
  * stage of the shared co-occurrence graph build and the graph-family
  * loops with a warm JVM, mirroring the driver-bench situation where
  * dozens of queries precede the first graph query. */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("PROBE_OBJ_FALLBACK", "128"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // JVM/codegen/shuffle warmup: a realistic mix like the driver bench
    t("warmup") {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.groupBy("l_returnflag").agg(sum("l_quantity")).collect()
      li.join(spark.read.parquet(s"$sfDir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count().collect()
    }
    // Fine-grained build attribution (each stage forces the next cache)
    t("  baskets") { graft.operators.GraphOps.baskets(spark, sfDir).count() }
    t("  pairSupport") { graft.operators.GraphOps.pairSupport(spark, sfDir).count() }
    t("  edges+deg") {
      val (e, d) = graft.operators.GraphOps.coGraph(spark, sfDir)
      e.count(); d.count()
    }
    t("kcore loop after explicit build") {
      graft.operators.GraphOps.kCorePeel(spark, sfDir).collect()
    }
    t("labelprop (und build + loop)") {
      graft.operators.GraphOps.labelPropagation(spark, sfDir).count()
    }
    t("bfs (warm caches)") {
      graft.operators.GraphOps.bfsHops(spark, sfDir).count()
    }
    t("sssp (wUnd build + loop)") {
      graft.operators.GraphOps.ssspCosts(spark, sfDir).count()
    }
    t("kcore loop (warm caches)") {
      graft.operators.GraphOps.kCorePeel(spark, sfDir).collect()
    }
    t("labelprop loop (warm caches)") {
      graft.operators.GraphOps.labelPropagation(spark, sfDir).count()
    }
    graft.ext.DedupOps.releaseShared()
    spark.stop()
  }
}
