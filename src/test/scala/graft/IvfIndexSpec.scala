package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.ext.SimilarityOps

/** Persisted IVF index (build once, serve many): the parquet artifact
  * round-trips, queries prune to the probed posting lists, and the
  * exactness endpoint (full probe ≡ brute force) survives persistence. */
class IvfIndexSpec extends SparkSuite {

  private val numQueries = 5

  /** Corpus WITHOUT the query vectors, so full-probe results over the
    * index are comparable to ivfTopK's candidate set (which excludes
    * vec_id < numQueries by filter). */
  private lazy val corpusDir: String = {
    val dir = tmpDir("graft-ivfcorpus")
    spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") >= numQueries)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    dir
  }

  private lazy val indexDir: String = {
    val dir = tmpDir("graft-ivfindex")
    SimilarityOps.ivfBuildIndex(spark, corpusDir, dir)
    dir
  }

  private lazy val queries = spark.read.parquet(s"$sf/embeddings.parquet")
    .filter(col("vec_id") < numQueries)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("full-probe query over the persisted index equals the inline full-probe (both are brute force)") {
    // full probe makes IVF exact for ANY centroid set, so the two sides
    // agree even though they trained on (slightly) different corpora
    val persisted = SimilarityOps
      .ivfQueryIndex(spark, indexDir, queries, k = 5, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val inline = SimilarityOps
      .ivfTopK(spark, sf, numQueries = numQueries, k = 5, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(persisted == inline)
  }

  test("probed query prunes the postings scan to the probe partitions") {
    val pruned = {
      // seeds are vec_id < nCentroids; the spec corpus excludes ids 0-4,
      // so 11 of the 16 seed slots materialize — size is data-dependent
      val cents = spark.read.parquet(s"$indexDir/centroids.parquet").collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1))).toSeq
      assert(cents.nonEmpty && cents.size <= 16)
      SimilarityOps.ivfQueryIndex(spark, indexDir, queries, k = 5, nProbe = 4)
    }
    // every query answered with a full top-k ranking
    val rows = pruned.collect()
    assert(rows.map(_.getLong(0)).distinct.length == numQueries)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 5L))
    }
    // the scan must carry cid partition filters (literal probe set ⇒
    // only probed posting-list directories are read)
    val plan = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(plan).isDefined,
      plan.take(800))
  }

  test("ANN probe results are true cosines and a subset of the full-probe ranking universe") {
    val ann = SimilarityOps.ivfQueryIndex(spark, indexDir, queries, k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val full = SimilarityOps.ivfQueryIndex(spark, indexDir, queries, k = 500, nProbe = 16)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    ann.foreach { case (qid, vid, cos) =>
      assert(full((qid, vid)) == cos, s"cos mismatch for ($qid,$vid)")
    }
  }
}
