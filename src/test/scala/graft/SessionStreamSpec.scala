package graft

import org.apache.spark.sql.functions._

import graft.streaming.{SessionStream, ViewCommit}

/** The native-session_window maintained view (T9 → ev_session_served):
  * the served replay equals the batch session aggregate bit-for-bit,
  * the append-commit protocol makes replayed batches no-ops and keeps
  * uncommitted data invisible, and a foreign owner fails loudly. */
class SessionStreamSpec extends SparkSuite {

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toSeq).toSeq

  test("served session view equals the batch session_window aggregate") {
    // the REAL streaming run (chunked file source, watermark flush,
    // commit protocol) vs the same aggregate in batch mode — identical
    // because finalized sessions are append-only and cents are an
    // exact monoid
    val served = canon(SessionStream.servedSessions(spark, sf))
    val batch = canon(
      SessionStream.sessionCents(graft.operators.EventOps.events(spark, sf))
        .orderBy(col("user_id"), col("session_start")))
    assert(served.nonEmpty)
    assert(served == batch)
  }

  test("append-commit protocol: replays are no-ops, empty deltas skip, uncommitted data is invisible") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-sessionview").toString
    val viewDir = s"$base/view"
    def sessions(rows: (Long, Long, Long, Long, Long)*) =
      rows.toDF("user_id", "session_start", "session_end_excl",
        "n_events", "sum_cents")
    // batch 0 commits two sessions
    SessionStream.applyBatch(sessions((1L, 10L, 310L, 2L, 500L),
      (2L, 20L, 320L, 1L, 100L)), 0L, viewDir, owner = "spec")
    assert(SessionStream.currentSessions(spark, viewDir).count() == 2)
    // an EMPTY batch 1 must not commit a new (empty-prefixed) version
    SessionStream.applyBatch(sessions().limit(0), 1L, viewDir, owner = "spec")
    assert(SessionStream.currentSessions(spark, viewDir).count() == 2)
    // batch 2 appends; replaying batch 0's content at id 0 is a no-op
    SessionStream.applyBatch(sessions((1L, 900L, 1200L, 3L, 700L)),
      2L, viewDir, owner = "spec")
    SessionStream.applyBatch(sessions((9L, 1L, 2L, 1L, 1L)),
      0L, viewDir, owner = "spec")
    val rows = canon(SessionStream.currentSessions(spark, viewDir)
      .orderBy(col("user_id"), col("session_start")))
    assert(rows == Seq(
      Seq(1L, 10L, 310L, 2L, 500L),
      Seq(1L, 900L, 1200L, 3L, 700L),
      Seq(2L, 20L, 320L, 1L, 100L)))
    // crash simulation: a data dir written WITHOUT a meta flip stays
    // invisible (readers go through _meta only)
    sessions((7L, 1L, 2L, 1L, 1L)).write.mode("overwrite")
      .parquet(s"$viewDir/data_b9")
    assert(SessionStream.currentSessions(spark, viewDir).count() == 3)
    // foreign owner: batch ids restarting at 0 under a different owner
    // must fail loudly, not silently skip
    intercept[IllegalArgumentException] {
      SessionStream.applyBatch(sessions((8L, 1L, 2L, 1L, 1L)),
        0L, viewDir, owner = "other-query")
    }
    // a never-committed view reads as empty with the right schema
    val empty = SessionStream.currentSessions(spark, s"$base/none")
    assert(empty.isEmpty &&
      empty.columns.toSeq == Seq("user_id", "session_start",
        "session_end_excl", "n_events", "sum_cents"))
  }

  test("commitMeta is atomic: readers never observe a torn manifest") {
    // (sanity pin on the shared primitive this view relies on)
    val base = java.nio.file.Files
      .createTempDirectory("graft-sessmeta").toString
    ViewCommit.commitMeta(spark, base, "0\nspec")
    ViewCommit.commitMeta(spark, base, "1\nspec")
    val fs = ViewCommit.fsFor(new org.apache.hadoop.fs.Path(base), spark)
    assert(ViewCommit.readMetaLines(fs, base).get.head.trim == "1")
  }
}
