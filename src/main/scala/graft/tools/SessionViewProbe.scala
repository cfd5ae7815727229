package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Local measurement aid: stage-times the ev_session_served artifact
  * build (chunk staging vs the AvailableNow maintenance run) and the
  * maintenance run's sensitivity to the maint session's shuffle/state
  * partition count (state-store files per batch = partitions).
  *
  * Usage: runMain graft.tools.SessionViewProbe <sfDir> [parts ...]
  */
object SessionViewProbe {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[sview] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val partsList = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(8, 4, 8, 4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.operators.EventOps.events(spark, dir)
      .select(col("event_id").cast("long").as("event_id"),
        col("ts"), col("user_id").cast("long").as("user_id"),
        col("event_type").cast("string").as("event_type"),
        col("value").cast("double").as("value"))
    t("warmup")(ev.limit(10).count())
    partsList.foreach { parts =>
      val d = java.nio.file.Files.createTempDirectory("sview_probe_").toString
      t(s"stage_chunks") {
        ev.repartitionByRange(3, col("ts"), col("event_id"))
          .write.parquet(s"$d/chunks")
        val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
        val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 3600L * 1000)
        import spark.implicits._
        Seq((-1L, sentinelTs, -1L, "sentinel", 0.0))
          .toDF("event_id", "ts", "user_id", "event_type", "value")
          .coalesce(1).write.parquet(s"$d/sentinel")
        val conf = spark.sparkContext.hadoopConfiguration
        val chunkPath = new org.apache.hadoop.fs.Path(s"$d/chunks")
        val cfs = chunkPath.getFileSystem(conf)
        val parts0 = cfs.listStatus(chunkPath).map(_.getPath)
          .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
          .sortBy(_.getName)
        val inDir = java.nio.file.Paths.get(d, "in")
        java.nio.file.Files.createDirectories(inDir)
        val t0 = System.currentTimeMillis() - 3600L * 1000
        parts0.zipWithIndex.foreach { case (p, i) =>
          val dst = inDir.resolve(f"chunk_$i%02d.parquet")
          java.nio.file.Files.copy(java.nio.file.Paths.get(p.toUri), dst)
          java.nio.file.Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(t0 + i * 10000L))
        }
        val sp = cfs.listStatus(new org.apache.hadoop.fs.Path(s"$d/sentinel"))
          .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
        val sdst = inDir.resolve("chunk_99.parquet")
        java.nio.file.Files.copy(java.nio.file.Paths.get(sp.toUri), sdst)
        java.nio.file.Files.setLastModifiedTime(sdst,
          java.nio.file.attribute.FileTime.fromMillis(t0 + parts0.length * 10000L))
      }
      t(s"maintenance_parts=$parts") {
        val maint = spark.newSession()
        maint.conf.set("spark.sql.shuffle.partitions", parts.toString)
        val stream = maint.readStream
          .schema(ev.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$d/in")
        val q = graft.streaming.SessionStream.maintain(
          stream, s"$d/view", s"$d/ckpt")
        q.awaitTermination()
      }
      t("read_view") {
        graft.streaming.SessionStream.currentSessions(spark, s"$d/view").count()
      }
    }
    spark.stop()
  }
}
