package graft.tools

/** Scratch main: print the registry's Map iteration order (= the order
  * Bench/Verify execute queries), to see which query absorbs each
  * session-shared cache build. */
object RegistryOrder {
  def main(args: Array[String]): Unit = {
    val ks = graft.SparkEntry.queries.keys.toList
    val graph = Set("q_kcore", "q_labelprop", "q_triangles",
      "q_triangles_approx", "q_sssp", "q_pagerank", "q_bfs",
      "q_degree_dist", "q_assoc_rules")
    println("[order] graph-family execution order: " +
      ks.filter(graph).mkString(", "))
    println("[order] total queries: " + ks.size)
  }
}
