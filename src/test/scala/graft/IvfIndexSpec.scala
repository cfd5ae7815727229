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

  test("incremental append: the grown index serves the whole corpus exactly at full probe") {
    // split the corpus: build the index on the first half, append the
    // second half. A one-shot rebuild over everything would train
    // DIFFERENT centroids, so bit-equality against it is not a valid
    // contract; the binding check is the exactness endpoint — full
    // probe over the append-grown index must equal brute force over
    // the grown corpus (full probe is exact for ANY centroid set, so
    // this catches lost/misfiled/duplicated appended vectors)
    val half1 = tmpDir("graft-ivf-h1")
    val grown = tmpDir("graft-ivf-grown")
    val corpus = spark.read.parquet(s"$corpusDir/embeddings.parquet")
    corpus.filter(col("vec_id") % 2 === 1)
      .write.mode(SaveMode.Overwrite).parquet(s"$half1/embeddings.parquet")

    val idxInc = tmpDir("graft-ivf-inc")
    SimilarityOps.ivfBuildIndex(spark, half1, idxInc)
    SimilarityOps.ivfAppendIndex(spark, idxInc,
      corpus.filter(col("vec_id") % 2 === 0))
    val a = SimilarityOps.ivfQueryIndex(spark, idxInc, queries, k = 5, nProbe = 16)
      .collect().map(_.toSeq).toSeq
    corpus.write.mode(SaveMode.Overwrite).parquet(s"$grown/embeddings.parquet")
    val brute = {
      val emb = spark.read.parquet(s"$grown/embeddings.parquet")
      val qs = queries
      import org.apache.spark.sql.expressions.Window
      val sims = emb.crossJoin(broadcast(qs))
        .select(col("qid"), col("vec_id"),
          round(SimilarityOps.cosine(col("qvec"), col("embedding")), 6).as("cos"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vec_id").asc)
      sims.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank"), col("vec_id"), col("cos"))
        .orderBy(col("qid"), col("rank"))
        .collect().map(_.toSeq).toSeq
    }
    assert(a == brute)

    // idempotence: a RETRIED batch (crash between the append write and
    // the caller's bookkeeping) must not file duplicate postings — the
    // anti-join guard drops already-indexed vec_ids
    val before = spark.read.parquet(s"$idxInc/postings.parquet").count()
    SimilarityOps.ivfAppendIndex(spark, idxInc,
      corpus.filter(col("vec_id") % 2 === 0))
    val after = spark.read.parquet(s"$idxInc/postings.parquet").count()
    assert(after == before, s"retried append duplicated postings: $before -> $after")
    val a2 = SimilarityOps.ivfQueryIndex(spark, idxInc, queries, k = 5, nProbe = 16)
      .collect().map(_.toSeq).toSeq
    assert(a2 == brute)
  }
}
