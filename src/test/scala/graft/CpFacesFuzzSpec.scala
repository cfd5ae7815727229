package graft

import org.apache.spark.sql.Row

import graft.CpFaces._

/** In-JVM twin of the FuzzCp/DuckDB gate for the model-backed cp
  * faces: the pod/job/Times chains' EXPECTED outputs are plain-Scala
  * models (no Spark), so the comparison runs inside `sbt test` on
  * seeded random documents — the from_json null paths and the typed
  * Aggregator's partial-aggregation merges get fuzzed on every CI run,
  * not only when the python harness runs. */
class CpFacesFuzzSpec extends SparkSuite {

  private def randomJobs(rng: scala.util.Random): Seq[JobItem] = {
    val parts = Seq("neo4j", "elastic", "postgres", "some", "job")
    val kinds = Seq("-bulk-", "-delta-", "-sync-", "")
    (0 until 3 + rng.nextInt(5)).map { _ =>
      JobItem(
        name = if (rng.nextInt(5) == 0) None
          else Some(parts(rng.nextInt(parts.size)) +
            kinds(rng.nextInt(kinds.size)) + (1500000000L + rng.nextInt(99999))),
        succeeded = rng.nextInt(4) match {
          case 0 => None
          case 1 => Some(0L)
          case _ => Some(rng.nextInt(3).toLong)
        },
        active = if (rng.nextBoolean()) Some(rng.nextInt(2).toLong) else None,
        complete = rng.nextBoolean())
    }
  }

  private def randomPods(rng: scala.util.Random, jobStart: Long): Seq[PodDoc] = {
    val names = Seq("build", "install", "sidecar", "build")
    (0 until 3 + rng.nextInt(4)).map { i =>
      PodDoc(f"pod$i%02d", (0 until rng.nextInt(4)).map { _ =>
        val terminated = rng.nextInt(4) == 0
        Container(names(rng.nextInt(names.size)), rng.nextBoolean(),
          rng.nextInt(3),
          if (terminated || rng.nextInt(5) == 0) None
          else Some(jobStart + (rng.nextInt(5) match {
            case 0 => 0L
            case _ => rng.between(-3600L, 3600L)
          })),
          terminated)
      })
    }
  }

  private def randomTimes(rng: scala.util.Random): Seq[TimesEvent] = {
    val sinks = Seq("neo4j", "elastic", "mongo")
    val evs = (0 until 2 + rng.nextInt(3)).flatMap { i =>
      val base = 1538050000L + rng.nextInt(50000)
      sinks.flatMap { sink =>
        (0 until rng.nextInt(3)).flatMap { _ =>
          Seq(Some(TimesEvent(s"ing$i", sink, "start", base + rng.nextInt(100))),
            if (rng.nextBoolean())
              Some(TimesEvent(s"ing$i", sink, "end", base + 200 + rng.nextInt(9999)))
            else None).flatten
        }
      }
    }
    if (evs.isEmpty) Seq(TimesEvent("ing0", "neo4j", "start", 1538050000L))
    else evs
  }

  /** Parse one model-built VALUES oracle back into comparable rows by
    * executing it through Spark SQL — the models emit plain VALUES, so
    * Spark doubles as the (engine-independent) evaluator here. */
  private def sqlRows(sql: String): Seq[Seq[Any]] = {
    // DuckDB printf/strftime oracles can't run here; only the pure
    // VALUES-model faces (ANSI both engines) go through this path
    spark.sql(sql).collect().map(_.toSeq.toSeq).toSeq
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map((r: Row) => r.toSeq.toSeq).toSeq

  test("job/pod/times chains equal their plain-Scala models on 25 random fixtures") {
    (1 to 25).foreach { seed =>
      val rng = new scala.util.Random(seed)
      val jobs = randomJobs(rng)
      assert(rows(jobStatus(jobs)(spark)) == sqlRows(jobStatusSql(jobs)),
        s"jobStatus mismatch at seed $seed: $jobs")
      val jobStart = 1539165900L + rng.nextInt(1000)
      val pods = randomPods(rng, jobStart)
      assert(rows(podStatus(pods, jobStart)(spark)) ==
        sqlRows(podStatusSql(pods, jobStart)),
        s"podStatus mismatch at seed $seed: $pods")
      val times = randomTimes(rng)
      assert(rows(timesAgg(times)(spark)) == sqlRows(timesAggSql(times)),
        s"timesAgg mismatch at seed $seed: $times")
    }
  }
}
