package graft

import graft.ext.SimilarityOps

/** The persisted JL-sketch artifact (rpBuildSketch/rpQuerySketch): the
  * query over the artifact equals the inline rpTopK bit-for-bit, and
  * the candidate-scoring phase provably never reads the wide embedding
  * column — the narrow-artifact scan the 100 TB design claims. */
class RpSketchSpec extends SparkSuite {

  test("query over the persisted sketch equals inline rpTopK; scoring scan is narrow") {
    val sketchDir = tmpDir("graft-rp-sketch") + "/sketch"
    SimilarityOps.rpBuildSketch(spark, sf, sketchDir)

    val viaArtifact = SimilarityOps.rpQuerySketch(spark, sf, sketchDir)
    val inline = SimilarityOps.rpTopK(spark, sf)
    assert(viaArtifact.collect().map(_.toSeq).toSeq ==
      inline.collect().map(_.toSeq).toSeq)

    // the artifact itself is the narrow table: its files carry only
    // (vec_id, red) — no 64-float embedding column anywhere
    val sk = spark.read.parquet(sketchDir)
    assert(sk.columns.sorted.toSeq == Seq("red", "vec_id"))

    // plan shape (string-based, AQE-safe like the other plan specs):
    // each FileScan renders Location + ReadSchema on one line, so any
    // line scanning the sketch artifact must not read `embedding` —
    // the scoring pass is provably the narrow scan
    val planStr = viaArtifact.queryExecution.executedPlan.toString
    val sketchLines = planStr.linesIterator
      .filter(_.contains("graft-rp-sketch")).toSeq
    assert(sketchLines.nonEmpty, s"no scan over the sketch artifact:\n$planStr")
    sketchLines.foreach { l =>
      assert(!l.contains("embedding"), s"sketch scan reads the wide column: $l")
    }
    // and the wide table IS still read (for the survivor fetch), so the
    // equality above exercised the two-table shape, not a fallback
    assert(planStr.contains("embeddings.parquet"))
  }
}
