package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch calibration main: fixed per-job/per-exchange cost of this
  * environment on trivial data, to attribute loop-query time between
  * real work and scheduling overhead. */
object JobCostProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[jc] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm
    spark.range(1000).count()
    spark.range(100000).groupBy(expr("id % 100")).count().collect()
    t("range(1M) count x5") {
      (1 to 5).foreach(_ => spark.range(1000000).count())
    }
    t("1M groupBy(100) collect x5") {
      (1 to 5).foreach(_ =>
        spark.range(1000000).groupBy(expr("id % 100")).count().collect())
    }
    t("1.2M groupBy(1.2M keys) count x3") {
      (1 to 3).foreach(_ =>
        spark.range(1200000).groupBy(col("id")).count().count())
    }
    val cached = spark.range(1200000).select(col("id"), (col("id") % 20000).as("v")).persist()
    cached.count()
    t("cached 1.2M agg(20k keys) collect x5") {
      (1 to 5).foreach(_ =>
        cached.groupBy(col("v")).agg(count(lit(1))).count())
    }
    t("localCheckpoint 20k rows x5") {
      (1 to 5).foreach(_ =>
        spark.range(20000).select(col("id")).localCheckpoint().count())
    }
    t("broadcast-join 1.2M x 20k collect-count x5") {
      (1 to 5).foreach(_ =>
        cached.join(broadcast(spark.range(20000).select(col("id").as("v"))), "v")
          .agg(count(lit(1))).head())
    }
    spark.stop()
  }
}
