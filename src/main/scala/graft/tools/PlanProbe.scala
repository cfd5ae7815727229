package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe main (not part of the driver contract): print the
  * executed plan of one or more registry queries, for authoring the
  * structural asserts in PlanShapeSpec without guessing at node names. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"=====PLAN $name=====")
      println(graft.SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
