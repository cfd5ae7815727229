package graft.streaming

/** Session-scoped temp artifacts for the SERVED faces of the streaming
  * monitors (trained-model dirs, replayed-view dirs): built once per
  * (kind, corpus dir), timed through [[graft.BuildTimers]], deleted by
  * [[clear]] from DedupOps.releaseShared with the other session caches.
  * Deletion is per-entry failure-isolated and the memo clears
  * REGARDLESS — a half-deleted dir must never stay memoized. */
private[graft] object ServedArtifacts {
  private val dirs =
    scala.collection.mutable.Map.empty[(String, String), String]

  def dir(kind: String, key: String)(build: String => Unit): String =
    dirs.synchronized {
      dirs.getOrElseUpdate((kind, key),
        graft.BuildTimers.timed(s"served_$kind") {
          val d = java.nio.file.Files
            .createTempDirectory(s"graft_${kind}_").toString
          build(d); d
        })
    }

  def clear(): Unit = dirs.synchronized {
    dirs.values.foreach { d =>
      try {
        val root = java.nio.file.Paths.get(d)
        if (java.nio.file.Files.exists(root)) {
          val walk = java.nio.file.Files.walk(root)
          try {
            import scala.jdk.CollectionConverters._
            walk.iterator().asScala.toSeq
              .sortBy(-_.getNameCount)
              .foreach(p => java.nio.file.Files.deleteIfExists(p))
          } finally walk.close()
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft] served-artifact cleanup of $d failed: $e")
      }
    }
    dirs.clear()
  }
}
