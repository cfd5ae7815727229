package graft
import org.apache.spark.sql.SparkSession

/** Local profiling aid (not part of the driver contract): times the
  * named queries IN THE ORDER GIVEN on one session, so shared-cache
  * cold costs land on whichever query runs first — mirroring what the
  * Bench harness does with its (hash-ordered) full registry.
  *
  * Usage: runMain graft.Profile <sfDir> <name> [<name> ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .limit(1000).groupBy("l_returnflag").count().collect()
    catch { case _: Throwable => () }
    args.drop(1).foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    graft.ext.DedupOps.releaseShared()
    spark.stop()
  }
}
