package graft

import graft.ingest.{IngestPipeline, Kubectl, KubectlAdapter}
import graft.model.Fixtures

/** The exec-boundary kubectl adapter driven by SCRIPTED
  * (exitCode, stdout, stderr) sequences replicating the reference's
  * jest `child_process` mock chains
  * (`__mocks__/child_process.js:44–48`, `ingestor.js:124–130,
  * 200–216,243–250`): error→empty→running→complete job polls,
  * error→not-ready pod polls, terminal error mapping for the jobs
  * listing, non-zero-exit job creation, and exit-code-ignoring
  * deletes — with the exact issued command lines asserted. */
class KubectlAdapterSpec extends SparkSuite {

  /** Scripted runner: replays a fixed result sequence (last result
    * repeats, like a jest mockReturnValue tail) and records every
    * command line. */
  private class Scripted(script: Seq[Kubectl.CommandResult])
      extends Kubectl.CommandRunner {
    val commands = scala.collection.mutable.ArrayBuffer.empty[String]
    private var i = 0
    def run(args: Seq[String]): Kubectl.CommandResult = {
      commands += args.mkString(" ")
      val r = script(math.min(i, script.size - 1)); i += 1; r
    }
  }

  private def ok(stdout: String) = Kubectl.CommandResult(0, stdout, "")
  private val err = Kubectl.CommandResult(1, "", "kubectl error")

  /** The reference's baseArgs prefix (child_process.js:57). */
  private val baseArgs = Seq("--context", "acp-notprod_DACC",
    "-n", "dacc-entitysearch", "--token", "MOCK_TOKEN")

  private val completeJob =
    """{"status": {"conditions": [{"type": "Complete", "status": "True"}],
      |"startTime": "2016-09-22T13:56:42Z", "succeeded": 1}}""".stripMargin
  private val runningJob =
    """{"status": {"startTime": "2016-09-22T13:56:42Z", "active": 1}}""".stripMargin

  test("job completion polls through the exec boundary: error -> empty -> running -> complete = 4") {
    val runner = new Scripted(Seq(
      Kubectl.CommandResult(1, "", "kubectl get jobs error"), // err -> re-poll
      ok(""),          // empty stdout -> parse-to-false -> re-poll
      ok(runningJob),  // not succeeded -> re-poll
      ok(completeJob)))
    val ad = new KubectlAdapter(runner, baseArgs)
    val polls = IngestPipeline.pollForJobComplete(spark,
      ad.jobJsonSupplier("neo4j-delta-1538055240"))
    assert(polls == 4, s"expected the jest 4-poll chain, got $polls")
    // every poll issued the exact reference command line
    val want = (baseArgs ++
      Seq("get", "jobs", "neo4j-delta-1538055240", "-o", "json")).mkString(" ")
    assert(runner.commands.toSeq == Seq.fill(4)(want), runner.commands.toSeq)
  }

  test("pod readiness polls: error -> no-build -> not-ready -> ready = 4") {
    val pods = Fixtures.podJsons.toMap
    val runner = new Scripted(Seq(
      Kubectl.CommandResult(1, "", "kubectl get pods error"),
      ok(pods("pod_no_build")),   // build container absent -> false
      ok(pods("pod_not_ready")),  // ready: false
      ok(pods("pod_ready"))))
    val ad = new KubectlAdapter(runner, baseArgs)
    val polls = IngestPipeline.pollForPodReady(spark,
      ad.podJsonSupplier("neo4j-0"))
    assert(polls == 4, s"expected 4 polls, got $polls")
    val want = (baseArgs ++ Seq("get", "pods", "neo4j-0", "-o", "json")).mkString(" ")
    assert(runner.commands.toSeq == Seq.fill(4)(want), runner.commands.toSeq)
  }

  test("getOldJobs: exec error and malformed stdout are the TERMINAL error state") {
    // err -> enterErrorState (ingestor.js:124-130)
    assert(new KubectlAdapter(new Scripted(Seq(err)), baseArgs)
      .oldJobNames(spark, "bulk").isLeft)
    // stdout that isn't a jobs document must not read as "no jobs"
    assert(new KubectlAdapter(new Scripted(Seq(ok("garbage not json"))), baseArgs)
      .oldJobNames(spark, "bulk").isLeft)
  }

  test("getOldJobs: valid listing picks the current neo4j+elastic job per type") {
    def adapter() = new KubectlAdapter(new Scripted(Seq(ok(Fixtures.jobsJson))), baseArgs)
    // bulk: head of neo4j-bulk-*, head of elastic-bulk-* (deleteOldJobs
    // :138-140), neo4j first like the reference's delete order
    assert(adapter().oldJobNames(spark, "bulk") ==
      Right(Seq("neo4j-bulk-1538055000", "elastic-bulk-1538055000")))
    // incremental -> -delta-: only elastic has a delta job in the
    // fixture (listed twice; head picks one)
    assert(adapter().oldJobNames(spark, "incremental") ==
      Right(Seq("elastic-delta-1537362006")))
  }

  test("create job surfaces non-zero exit; delete ignores the exit code") {
    val failing = new Scripted(Seq(Kubectl.CommandResult(1, "", "")))
    val e = intercept[Kubectl.KubectlExecException] {
      new KubectlAdapter(failing, baseArgs)
        .createJob("neo4j-delta-1538022222", "neo4j-delta")
    }
    // the reference's exact message shape (ingestor.js:248)
    assert(e.getMessage == "neo4j-delta-1538022222 exits with non zero code")
    assert(failing.commands.head.endsWith(
      "create job neo4j-delta-1538022222 --from cronjob/neo4j-delta"))

    val okRun = new Scripted(Seq(ok("")))
    new KubectlAdapter(okRun, baseArgs).createJob("elastic-bulk-1538055555", "elastic-bulk")

    // delete: only waits for exit, code ignored (:146,163)
    val delFail = new Scripted(Seq(Kubectl.CommandResult(1, "", "no such job")))
    new KubectlAdapter(delFail, baseArgs)
      .deleteJobs(Seq("neo4j-bulk-1538055000", "elastic-bulk-1538055000"))
    assert(delFail.commands.toSeq == Seq((baseArgs ++ Seq("delete", "jobs",
      "neo4j-bulk-1538055000", "elastic-bulk-1538055000")).mkString(" ")))
    // no names -> no process spawned
    val delEmpty = new Scripted(Seq(ok("")))
    new KubectlAdapter(delEmpty, baseArgs).deleteJobs(Nil)
    assert(delEmpty.commands.isEmpty)
  }

  test("runJob waterfall replays end to end through ONE exec boundary") {
    // the reference's runJob (ingestor.js:238-270): waitForPods ->
    // create job -> checkJobStatus -> settle -> waitForRollingUpdate.
    // One scripted runner serves every stage, dispatching on the
    // command like the jest getOutput switch — so the whole waterfall
    // crosses the same process seam the reference crosses.
    val pods = Fixtures.podJsons.toMap
    val jobStartSec = 1539100000L // before the fresh pod's startedAt
    var created = List.empty[String]
    val runner = new Kubectl.CommandRunner {
      val podPolls = Iterator(pods("pod_not_ready"), pods("pod_ready"))
      val jobPolls = Iterator(runningJob, completeJob)
      val rollPolls = Iterator(pods("pod_stale"), pods("pod_ready"))
      def run(args: Seq[String]): Kubectl.CommandResult = {
        val cmd = args.drop(baseArgs.size).mkString(" ")
        cmd match {
          case c if c.startsWith("get pods neo4j-0") && created.isEmpty =>
            ok(if (podPolls.hasNext) podPolls.next() else pods("pod_ready"))
          case c if c.startsWith("create job") =>
            created ::= c; ok("")
          case c if c.startsWith("get jobs neo4j-delta-1538055555") =>
            ok(if (jobPolls.hasNext) jobPolls.next() else completeJob)
          case c if c.startsWith("get pods neo4j-0") =>
            ok(if (rollPolls.hasNext) rollPolls.next() else pods("pod_ready"))
          case c => fail(s"unexpected kubectl call: $c")
        }
      }
    }
    val ad = new KubectlAdapter(runner, baseArgs)
    // stage 1: waitForPods — not-ready then ready = 2 polls
    assert(IngestPipeline.pollForPodReady(spark, ad.podJsonSupplier("neo4j-0")) == 2)
    // stage 2: create job (exit 0)
    ad.createJob("neo4j-delta-1538055555", "neo4j-delta")
    assert(created == List("create job neo4j-delta-1538055555 --from cronjob/neo4j-delta"))
    // stage 3: checkJobStatus — running then complete = 2 polls
    assert(IngestPipeline.pollForJobComplete(spark,
      ad.jobJsonSupplier("neo4j-delta-1538055555")) == 2)
    // stages 4+5: settle, then rolling update — the stale pod
    // (startedAt before the job start) polls again; the fresh one ends
    // the stage. Drives the SAME adapter supplier through
    // awaitRollingUpdate's freshness predicate.
    var settles = 0
    IngestPipeline.awaitRollingUpdate(spark,
      () => Seq(ad.podJsonSupplier("neo4j-0")()), jobStartSec,
      settle = () => settles += 1, maxPolls = 10)
    assert(settles >= 1, "the fixed one-interval settle must run")
  }

  test("a spawn FAILURE (runner throws) is the err callback, not a crash") {
    val runner = new Kubectl.CommandRunner {
      var calls = 0
      def run(args: Seq[String]): Kubectl.CommandResult = {
        calls += 1
        if (calls == 1) throw new java.io.IOException("No such file: kubectl")
        Kubectl.CommandResult(0, completeJob, "")
      }
    }
    val ad = new KubectlAdapter(runner, baseArgs)
    // the poller re-polls straight through the spawn failure
    assert(IngestPipeline.pollForJobComplete(spark,
      ad.jobJsonSupplier("neo4j-bulk-1538055555")) == 2)
    // and the terminal seam maps it to the error state
    val ad2 = new KubectlAdapter(new Kubectl.CommandRunner {
      def run(args: Seq[String]) = throw new java.io.IOException("boom")
    }, baseArgs)
    assert(ad2.oldJobNames(spark, "bulk").isLeft)
  }

  test("a HANGING process is killed at the timeout and maps like any exec error") {
    // the real seam against a process that never exits or closes its
    // streams within the bound: `sleep 30` through ProcessRunner with a
    // 1-second timeout must kill it and surface KubectlExecException
    val runner = new Kubectl.ProcessRunner(binary = "sleep", timeoutSec = 1L)
    val t0 = System.nanoTime()
    val e = intercept[Kubectl.KubectlExecException] { runner.run(Seq("30")) }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 10.0, f"timeout did not bound the wait: $sec%.1f s")
    assert(e.getMessage.contains("timed out"), e.getMessage)
    // through the adapter the timeout is the err-callback case: the
    // poll-shaped supplier throws (poller re-polls), the terminal jobs
    // listing goes to the error state — same contract as a spawn
    // failure (the wrapper hangs regardless of the kubectl args)
    val hangs = new Kubectl.CommandRunner {
      def run(args: Seq[String]): Kubectl.CommandResult = runner.run(Seq("30"))
    }
    val ad = new KubectlAdapter(hangs, Nil)
    intercept[Kubectl.KubectlExecException] { ad.jobJsonSupplier("j1")() }
    assert(ad.oldJobNames(spark, "bulk").isLeft)
  }
}
