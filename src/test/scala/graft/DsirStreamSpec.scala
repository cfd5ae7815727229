package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.ext.TextOps
import graft.streaming.DsirStream

/** MemoryStream row — top level for encoder reach. */
final case class DsirDoc(doc_id: Long, text: String)

/** Streaming DSIR admission: the batch-trained 256-bucket ratio grid
  * served on a document stream produces scores and admission decisions
  * bit-identical to the batch face for the same rows. */
class DsirStreamSpec extends SparkSuite {

  test("served DSIR scores equal the batch face row for row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val model = tmpDir("graft-dsirmodel") + "/model"
    DsirStream.writeModel(spark, sf, model)
    // the artifact is the dense grid + the batch threshold
    assert(spark.read.parquet(s"$model/ratios").count() == TextOps.dsirBuckets)

    // stream 40 corpus documents (including any empty-text rows)
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => DsirDoc(r.getLong(0), r.getString(1))).take(40)
    val input = MemoryStream[DsirDoc]
    input.addData(rows.toIndexedSeq: _*)
    val q = DsirStream.scoreStream(input.toDF(), model)
      .writeStream.format("memory").queryName("dsir_stream_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dsir_stream_out").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

    val batch = TextOps.dsirScores(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(streamed.size == 40)
    streamed.foreach { case (id, served) =>
      assert(batch(id) == served, s"doc $id served $served != batch ${batch(id)}")
    }

    // an out-of-vocabulary document still scores (the dense-grid
    // default), rather than failing a lookup
    val input2 = MemoryStream[DsirDoc]
    input2.addData(DsirDoc(9999L, "zzqqxx yyww zzqqxx"))
    val q2 = DsirStream.scoreStream(input2.toDF(), model)
      .writeStream.format("memory").queryName("dsir_stream_oov")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable()
    q2.stop()
    val oov = spark.table("dsir_stream_oov").collect().head
    assert(oov.getLong(1) == 3L && oov.getLong(2) > 0L)
  }
}
