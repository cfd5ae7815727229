package graft

import org.apache.spark.sql.functions._

import graft.model.Fixtures
import graft.operators.KubeOps

/** Mirrors helpers.spec.js:18–110,147–192,223–229,303–328. */
class KubeOpsSpec extends SparkSuite {

  private def jobs = {
    import spark.implicits._
    KubeOps.parseJobs(Seq(Fixtures.jobsJson).toDF("json"))
  }

  test("job relevance: entitysearch jobs kept, other jobs dropped (helpers.spec.js:173–186)") {
    val names = jobs.filter(KubeOps.isRelevantJob(col("name")))
      .select("name").collect().map(_.getString(0)).toSeq
    assert(names.toSet == Set("elastic-bulk-1538055000", "neo4j-bulk-1538055000",
      "elastic-delta-1537362006"))
    assert(names.length == 4) // the delta job appears twice
  }

  test("bulk labels match -bulk-, delta labels match -delta- (helpers.spec.js:147–171)") {
    val bulk = KubeOps.jobLabels(jobs, "bulk").collect().map(_.getString(0)).toSet
    val delta = KubeOps.jobLabels(jobs, "incremental").collect().map(_.getString(0)).toSet
    assert(bulk == Set("elastic-bulk-1538055000", "neo4j-bulk-1538055000"))
    assert(delta == Set("elastic-delta-1537362006"))
  }

  test("job succeeded: count>=1 is done, active-only is not (helpers.spec.js:18–39,189–192)") {
    val got = jobs.select(coalesce(col("name"), lit("?")).as("n"),
        KubeOps.jobSucceeded(col("succeeded")).as("done"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("elastic-bulk-1538055000"))
    assert(!got("elastic-delta-1537362006"))
    assert(!got("?")) // no status.succeeded path at all
  }

  private def pods = {
    import spark.implicits._
    Fixtures.podJsons.toDF("pod", "json")
      .select(col("pod"), from_json(col("json"), KubeOps.podSchema).as("doc"))
  }

  test("pod ready: only the build container counts (helpers.spec.js:223–229)") {
    val got = pods.select(col("pod"), KubeOps.podReady(col("doc")).as("r"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("pod_ready"))
    assert(!got("pod_not_ready"))
    assert(!got("pod_no_build"))   // ready sidecar ignored
    assert(!got("pod_terminated"))
  }

  test("startedAt null for terminated containers (helpers.spec.js:303–328)") {
    val got = pods.select(col("pod"), KubeOps.podStartedAt(col("doc")).as("t"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("pod_terminated").isEmpty)
    assert(got("pod_no_build").isEmpty)
    assert(got("pod_ready").isDefined)
  }

  test("pod freshness: startedAt after job start (ingestor.js:187–189)") {
    val jobStart = lit("2018-10-10 10:05:00").cast("timestamp")
    val got = pods.select(col("pod"),
        KubeOps.podFresh(KubeOps.podStartedAt(col("doc")), jobStart).as("f"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("pod_ready"))        // 10:10 > 10:05
    assert(!got("pod_stale"))       // previous day
    assert(!got("pod_terminated"))  // no timestamp ⇒ not fresh
  }
}
