package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: print formatted physical plans for the flagship queries so
  * scale-critical properties (broadcasts, top-k fusion, pushed filters,
  * partial aggregation) can be audited. Run:
  *   sbt "runMain graft.PlanAudit q5_revenue_by_nation ..." */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // iterative queries execute during CONSTRUCTION (driver-checked
    // convergence), so "explain" would run the whole computation and
    // print only the final checkpoint scan — audit their building
    // blocks instead (the source scaladoc documents the loop shape)
    val iterative = Set("dedup_clusters")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      if (iterative(n))
        println("(iterative query — plans per round; see DedupOps.dedupClusters scaladoc)")
      else
        SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
