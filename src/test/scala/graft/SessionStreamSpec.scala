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
    // a committed manifest whose data dir was removed out-of-band
    // (legacy two-line manifest, data_b dir manually cleaned) falls
    // back to the empty view instead of parquet's opaque zero-path
    // schema error (r18 ADVICE)
    graft.streaming.ViewCommit.commitMeta(spark, viewDir, "2\nspec")
    val fs = new org.apache.hadoop.fs.Path(viewDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(viewDir)).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith("seg_") || n.startsWith("data_b"))
        fs.delete(s.getPath, true)
    }
    val orphaned = SessionStream.currentSessions(spark, viewDir)
    assert(orphaned.isEmpty &&
      orphaned.columns.toSeq == Seq("user_id", "session_start",
        "session_end_excl", "n_events", "sum_cents"))
  }

  // (relative file name, length) per seg_* dir — the byte-identity
  // proxy the immutability pins compare
  private def segFiles(viewDir: String): Map[String, Seq[(String, Long)]] = {
    val root = java.nio.file.Paths.get(viewDir)
    if (!java.nio.file.Files.exists(root)) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      val it = java.nio.file.Files.list(root)
      try it.iterator().asScala.toSeq
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("seg_"))
        .map { d =>
          val fl = java.nio.file.Files.list(d)
          val files =
            try fl.iterator().asScala.toSeq
              .map(f => (f.getFileName.toString, java.nio.file.Files.size(f)))
              .sortBy(_._1)
            finally fl.close()
          d.getFileName.toString -> files
        }.toMap
      finally it.close()
    }
  }

  test("segment commits: each batch writes only its delta, committed segments are immutable, compaction bounds the count") {
    import spark.implicits._
    val base = tmpDir("graft-sess-seg")
    val viewDir = s"$base/view"
    def sess(u: Long) =
      Seq((u, u * 1000L, u * 1000L + 10L, 1L, 1L))
        .toDF("user_id", "session_start", "session_end_excl",
          "n_events", "sum_cents")
    (0L to 3L).foreach { i =>
      val before = segFiles(viewDir)
      SessionStream.applyBatch(sess(i), i, viewDir, owner = "spec",
        compactAfter = 4)
      val after = segFiles(viewDir)
      // O(delta) per batch: exactly one new segment, nothing rewritten
      before.foreach { case (d, files) =>
        assert(after.get(d).contains(files),
          s"committed segment $d changed at batch $i — segments are immutable")
      }
      assert((after.keySet -- before.keySet) == Set(s"seg_b$i"),
        s"batch $i must add exactly its own delta segment, " +
          s"got ${after.keySet -- before.keySet}")
    }
    val fs = ViewCommit.fsFor(new org.apache.hadoop.fs.Path(viewDir), spark)
    assert(ViewCommit.readMetaLines(fs, viewDir).get
      .drop(2).count(_.trim.nonEmpty) == 4)
    // batch 4 crosses compactAfter=4: the manifest collapses to ONE
    // compacted segment and the content is the union of all deltas
    SessionStream.applyBatch(sess(4L), 4L, viewDir, owner = "spec",
      compactAfter = 4)
    val lines = ViewCommit.readMetaLines(fs, viewDir).get
    assert(lines.drop(2).map(_.trim).filter(_.nonEmpty) == Seq("seg_c4"))
    val rows = canon(SessionStream.currentSessions(spark, viewDir)
      .orderBy(col("user_id")))
    assert(rows.map(_.head) == Seq(0L, 1L, 2L, 3L, 4L))
    // compacted-away segments were GC'd
    assert(segFiles(viewDir).keySet == Set("seg_c4"))
  }

  test("a legacy single-version manifest upgrades in place: the data dir folds in as the first segment") {
    import spark.implicits._
    val base = tmpDir("graft-sess-legacyseg")
    val viewDir = s"$base/view"
    def sess(u: Long) =
      Seq((u, 10L, 20L, 1L, 1L))
        .toDF("user_id", "session_start", "session_end_excl",
          "n_events", "sum_cents")
    // hand-write the pre-segment layout: merged data at data_b0 plus a
    // two-line manifest
    sess(1L).write.parquet(s"$viewDir/data_b0")
    graft.streaming.ViewCommit.commitMeta(spark, viewDir, "0\nspec")
    assert(SessionStream.currentSessions(spark, viewDir).count() == 1)
    SessionStream.applyBatch(sess(2L), 1L, viewDir, owner = "spec")
    val fs = ViewCommit.fsFor(new org.apache.hadoop.fs.Path(viewDir), spark)
    val lines = ViewCommit.readMetaLines(fs, viewDir).get
    assert(lines.drop(2).map(_.trim).filter(_.nonEmpty) ==
      Seq("data_b0", "seg_b1"))
    assert(canon(SessionStream.currentSessions(spark, viewDir)
      .orderBy(col("user_id"))).map(_.head) == Seq(1L, 2L))
  }

  test("maintenance runs on an isolated session: the main session's shuffle conf never flips") {
    import spark.implicits._
    val base = tmpDir("graft-sess-iso")
    val inDir = s"$base/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ev(id: Long, sec: Long, u: Long, typ: String) =
      (id, new java.sql.Timestamp(t0.getTime + sec * 1000L), u, typ, 1.0)
    // one staged file: two sessions plus the far-future sentinel that
    // flushes them (conf isolation is what's under test, not chunking)
    val events = Seq(ev(1, 0, 1, "click"), ev(2, 60, 1, "click"),
      ev(3, 7200, 2, "view"), ev(-1, 999999, -1, "sentinel"))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    events.coalesce(1).write.parquet(s"$base/stage")
    import scala.jdk.CollectionConverters._
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(s"$base/stage"))
      .iterator().asScala.toSeq
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.copy(part,
      java.nio.file.Paths.get(inDir, "chunk_00.parquet"))
    val orig = spark.conf.get("spark.sql.shuffle.partitions")
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    @volatile var stop = false
    // the parallel observer: samples the MAIN session's conf while the
    // maintenance query (which wants 8 state partitions) runs
    val sampler = new Thread(() => {
      while (!stop) {
        seen.add(spark.conf.get("spark.sql.shuffle.partitions"))
        Thread.sleep(2)
      }
    })
    sampler.start()
    try SessionStream.runMaintenance(spark, inDir, events.schema,
      s"$base/view", s"$base/ckpt")
    finally { stop = true; sampler.join() }
    assert(seen.asScala.toSet == Set(orig),
      s"main-session shuffle conf observed mid-maintenance: ${seen.asScala}")
    // the isolated run still committed the finalized sessions
    val served = SessionStream.currentSessions(spark, s"$base/view")
      .filter(!(col("user_id") <=> lit(-1L)))
    assert(served.count() == 2)
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
