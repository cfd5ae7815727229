package graft.tools
object DumpOrder {
  def main(args: Array[String]): Unit = {
    val qs = graft.SparkEntry.queries.keys.toList
    val os = graft.SparkEntry.oracleSql.keys.toList
    java.nio.file.Files.write(java.nio.file.Paths.get("REGISTRY_ORDER.txt"),
      (qs.mkString("\n") + "\n---ORACLE---\n" + os.mkString("\n") + "\n").getBytes("UTF-8"))
    println(s"[order] wrote ${qs.size} query keys, ${os.size} oracle keys")
  }
}
