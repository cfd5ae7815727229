package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.ext.TextOps
import graft.streaming.ScoreStream

/** Streaming quality scoring: batch-trained weights served on a stream
  * produce scores bit-identical to the batch face for the same rows. */
class ScoreStreamSpec extends SparkSuite {

  final case class Doc(doc_id: Long, text: String)

  test("streamed scores equal the batch face's scores row for row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val model = tmpDir("graft-lrmodel") + "/model"
    ScoreStream.writeModel(spark, sf, model)
    // the artifact holds the memoized session weights
    val art = spark.read.parquet(model).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchW = TextOps.qualityLrWeights(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(art == batchW)

    // stream the first 40 corpus documents through the scorer
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => Doc(r.getLong(0), r.getString(1))).take(40)
    val input = MemoryStream[Doc]
    input.addData(rows.toIndexedSeq: _*)
    val outName = "score_stream_out"
    val q = ScoreStream.scoreStream(input.toDF(), model)
      .writeStream.format("memory").queryName(outName)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table(outName).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap

    val batch = TextOps.qualityLrScores(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(streamed.size == 40)
    streamed.foreach { case (id, sp) =>
      assert(batch(id) == sp, s"doc $id served != batch")
    }
  }
}
