package graft.tools

import org.apache.spark.sql.SparkSession

import scala.util.control.NonFatal

/** Local measurement aid (guide §1 "measure first", not part of the
  * driver contract): splits each registered query's WARM wall time into
  * the Catalyst phases (`QueryExecution.tracker` — parsing/analysis/
  * optimization/physical planning, all single-threaded driver work) and
  * the residual execution time, so driver-bound queries are separable
  * from executor-bound ones. Planning work does not parallelize with
  * `SPARK_GRAFT_CPUS`, so a high plan share predicts poor core-count
  * scaling in the driver's low-core bench pass.
  *
  * Usage: runMain graft.tools.PlanTimeProbe <sfDir> [<name> ...]
  * (no names = full registry). Two passes per query; the second
  * (codegen-cached, session-caches warm) is the one reported.
  */
object PlanTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .limit(1000).groupBy("l_returnflag").count().collect()
    catch { case NonFatal(_) => () }
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq
    val rows = names.flatMap { name =>
      graft.SparkEntry.queries.get(name).map { fn =>
        def once(): (Double, Double, Double) = {
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          // force analysis+optimization+physical planning without
          // running a job, then read the tracker's phase clock
          val qe = df.queryExecution
          qe.executedPlan
          val tPlanned = (System.nanoTime() - t0) / 1e9
          val phases = qe.tracker.phases.map { case (k, v) =>
            k -> (v.endTimeMs - v.startTimeMs) / 1e3
          }
          val planPhases = phases.values.sum
          df.count()
          val tTotal = (System.nanoTime() - t0) / 1e9
          (tTotal, tPlanned, planPhases)
        }
        once() // cold: codegen + session builds land here
        val (total, planned, phases) = once()
        println(f"[plantime] $name%-28s total=$total%6.2f s  " +
          f"build+plan=$planned%5.2f  phases=$phases%5.2f  " +
          f"exec=${total - planned}%6.2f")
        (name, total, planned)
      }
    }
    val totAll = rows.map(_._2).sum
    val planAll = rows.map(_._3).sum
    println(f"[plantime] TOTAL warm=$totAll%.1f s  plan-side=$planAll%.1f s " +
      f"(${100 * planAll / math.max(totAll, 1e-9)}%.0f%%) over ${rows.size} queries")
    graft.ext.DedupOps.releaseShared()
    spark.stop()
  }
}
