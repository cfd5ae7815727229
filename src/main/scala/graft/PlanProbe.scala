package graft
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      println(s"=== $q ===")
      println(SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
