package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.DedupStream
import graft.streaming.DedupStream.Doc

/** Streaming incremental dedup: admission is exactly-once per distinct
  * text within a batch, across batches, and across query RESTARTS (the
  * digest store outlives the query — the property
  * dropDuplicatesWithinWatermark cannot give corpus building). */
class DedupStreamSpec extends SparkSuite {

  private def admittedIds(dir: String): Set[Long] =
    spark.read.parquet(dir).select("doc_id").collect().map(_.getLong(0)).toSet

  test("admitStream dedupes within batch, across batches, and across restarts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val store = tmpDir("graft-dstore") + "/digests"
    val out = tmpDir("graft-dadmit") + "/admitted"

    val input = MemoryStream[Doc]
    // batch 1: in-batch dup (1,3 share text) — keeper is min doc_id
    input.addData(Doc(1, "aaa"), Doc(2, "bbb"), Doc(3, "aaa"))
    val q = DedupStream.admitStream(input.toDF(), store, out,
      Trigger.AvailableNow())
    q.processAllAvailable()
    assert(admittedIds(out) == Set(1L, 2L))
    q.stop()

    // batch 2, SAME query lineage not required — new query, same store:
    // 4 duplicates stored content, 5 is new
    val input2 = MemoryStream[Doc]
    input2.addData(Doc(4, "bbb"), Doc(5, "ccc"))
    val q2 = DedupStream.admitStream(input2.toDF(), store, out,
      Trigger.AvailableNow())
    q2.processAllAvailable()
    assert(admittedIds(out) == Set(1L, 2L, 5L))
    q2.stop()

    // the admitted table itself is digest-unique (the downstream corpus
    // sees one row per distinct text ever streamed)
    val dups = spark.read.parquet(out)
      .groupBy("digest").count().filter(col("count") > 1).count()
    assert(dups == 0L)
    // and the store holds exactly the admitted digests
    val storeD = spark.read.parquet(store).select("digest")
      .collect().map(_.getString(0)).toSet
    val admitD = spark.read.parquet(out).select("digest")
      .collect().map(_.getString(0)).toSet
    assert(storeD == admitD)
  }
}
