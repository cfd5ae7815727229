package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: diagnose withGlobalRank vs a single-partition
  * row_number ground truth on the ev_rfm recency metric at sf0.1. */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val u = graft.operators.EventOps.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("last_day"),
        count(lit(1)).as("n_events"))
    val ranked = graft.operators.Relational
      .withGlobalRank(u, Seq(col("last_day").asc, col("user_id").asc))
      .select(col("user_id"), col("last_day"), col("rn"))
    val truth = {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("last_day").asc, col("user_id").asc)
      u.select(col("user_id"), row_number().over(w).cast("long").as("true_rn"))
    }
    val joined = ranked.join(truth, "user_id")
      .withColumn("diff", col("rn") - col("true_rn"))
    val bad = joined.filter(col("diff") =!= 0)
    println(s"PROBE mismatched=${bad.count()} of ${joined.count()}")
    bad.orderBy(col("true_rn")).show(20, false)
    println("PROBE user 1150:")
    joined.filter(col("user_id") === 1150).show(false)
    spark.stop()
  }
}
