package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Extractors over kubectl JSON documents (SURVEY.md §2.2 P6–P11, P13;
  * §2.8 F4/F9). The reference shells out to `kubectl ... -o json` and
  * navigates the parsed object with `R.pathOr` defaults
  * (/root/reference/src/helpers.js:41–87); here the JSON text becomes a
  * DataFrame via `from_json` with explicit schemas, and the pathOr
  * defaults become `coalesce` over nullable struct fields.
  */
object KubeOps {

  /** Schema for `kubectl get jobs -o json`
    * (src/__mocks__/child_process.js:14–42). */
  val jobsSchema: StructType = StructType(Seq(
    StructField("items", ArrayType(StructType(Seq(
      StructField("metadata", StructType(Seq(
        StructField("name", StringType)))),
      StructField("status", StructType(Seq(
        StructField("succeeded", LongType),
        StructField("active", LongType),
        StructField("conditions", ArrayType(StructType(Seq(
          StructField("type", StringType),
          StructField("status", StringType)))))))))))
    )))

  /** Schema for `kubectl get pods <name> -o json`
    * (helpers.spec.js:41–110). */
  val podSchema: StructType = StructType(Seq(
    StructField("status", StructType(Seq(
      StructField("containerStatuses", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("ready", BooleanType),
        StructField("restartCount", IntegerType),
        StructField("state", StructType(Seq(
          StructField("running", StructType(Seq(
            StructField("startedAt", TimestampType)))),
          StructField("terminated", StructType(Seq(
            StructField("containerID", StringType))))))))))))))))

  /** Parse raw kubectl-jobs JSON strings into one row per job item. */
  def parseJobs(raw: DataFrame, jsonCol: String = "json"): DataFrame =
    raw
      .select(from_json(col(jsonCol), jobsSchema).as("doc"))
      .select(explode(col("doc.items")).as("item"))
      .select(
        col("item.metadata.name").as("name"),
        col("item.status.succeeded").as("succeeded"),
        col("item.status.active").as("active"),
        col("item.status.conditions").as("conditions"))

  /** P6 `filterJobs` (helpers.js:48–54): name tokens ∩ {neo4j, elastic}
    * non-empty; missing name defaults to ''. Per-row array op, no shuffle. */
  def isRelevantJob(name: Column): Column =
    size(array_intersect(
      split(coalesce(name, lit("")), "-"),
      array(lit("neo4j"), lit("elastic")))) > 0

  /** P7 regex for the ingest type: `incremental` jobs are named `-delta-`
    * (ingestor.js:122; helpers.js:41–42). */
  def typePattern(ingestType: String): String =
    if (ingestType == "incremental") "-delta-" else "-bulk-"

  /** `getJobLabels` (helpers.js:41–46): relevant job names matching the
    * ingest-type pattern. */
  def jobLabels(jobs: DataFrame, ingestType: String): DataFrame =
    jobs
      .filter(isRelevantJob(col("name")))
      .select(col("name"))
      .filter(col("name").rlike(typePattern(ingestType)))

  /** P9 `getStatus` (helpers.js:56): `status.succeeded` with false default;
    * succeeded is a count, truthiness ⇒ >= 1 (helpers.spec.js:30,189–192). */
  def jobSucceeded(succeeded: Column): Column =
    coalesce(succeeded, lit(0L)) >= 1L

  /** Find the `build` container in status.containerStatuses[]
    * (helpers.js:78,85 hard-code the name). */
  private def buildContainer(pod: Column): Column =
    try_element_at(filter(pod.getField("status").getField("containerStatuses"),
      c => c.getField("name") === "build"), lit(1))

  /** P10 `getPodStatus` (helpers.js:75–80): ready flag of the `build`
    * container, false when absent. */
  def podReady(pod: Column): Column =
    coalesce(buildContainer(pod).getField("ready"), lit(false))

  /** P11 `getPodStartedAt` (helpers.js:82–87): running.startedAt of the
    * `build` container; terminated containers have no such path ⇒ null
    * (helpers.spec.js:308–327 — the reference returns false; we use null,
    * the SQL-typed equivalent). */
  def podStartedAt(pod: Column): Column =
    buildContainer(pod).getField("state").getField("running").getField("startedAt")

  /** P13 pod freshness (ingestor.js:187–189): pod restarted after the job
    * started ⇒ the rolling update reached it. */
  def podFresh(startedAt: Column, jobStart: Column): Column =
    startedAt.isNotNull && startedAt > jobStart

  /** Parse raw pod JSON into (ready, startedAt) columns. */
  def parsePods(raw: DataFrame, jsonCol: String = "json"): DataFrame =
    raw
      .select(from_json(col(jsonCol), podSchema).as("pod"))
      .select(
        podReady(col("pod")).as("ready"),
        podStartedAt(col("pod")).as("startedAt"))

  /** Schema of a SINGLE job document (`kubectl get jobs <name> -o json`,
    * helpers.spec.js:18–39 — status at the top level, no items array). */
  val singleJobSchema: StructType = StructType(Seq(
    StructField("status", StructType(Seq(
      StructField("succeeded", LongType),
      StructField("active", LongType))))))

  /** `getStatus` over one kubectl reply (helpers.js:56, checkJobStatus
    * ingestor.js:211–224): true iff status.succeeded is truthy. Empty or
    * malformed stdout parses to a null doc ⇒ false, exactly the
    * reference's try/catch-to-false. */
  def jobCompleteJson(spark: SparkSession, raw: String): Boolean = {
    import spark.implicits._
    Seq(Option(raw).getOrElse("")).toDF("json")
      .select(from_json(col("json"), singleJobSchema).as("doc"))
      .select(jobSucceeded(col("doc.status.succeeded")).as("done"))
      .collect().headOption.exists(_.getBoolean(0))
  }

  /** `getPodStatus` over one kubectl reply (helpers.js:75–80,
    * checkPodStatus ingestor.js:196–209): build-container ready flag,
    * false on empty/malformed stdout. */
  def podReadyJson(spark: SparkSession, raw: String): Boolean = {
    import spark.implicits._
    parsePods(Seq(Option(raw).getOrElse("")).toDF("json"))
      .collect().headOption.exists(r => !r.isNullAt(0) && r.getBoolean(0))
  }
}
