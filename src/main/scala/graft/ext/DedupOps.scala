package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Deduplication operators over the `documents` table — exact, n-gram
  * Jaccard, MinHash-LSH and SimHash (north star [EXT]; see
  * /root/repo/PAPERS.md for the MinHash/LSH background).
  *
  * Scale design (100 TB): every near-dup variant is a *banded equi-join*
  * — explode candidate keys (shingle / band signature / simhash block),
  * shuffle on the key, verify within the bucket. Never an all-pairs
  * cross join. High-frequency keys are capped (`maxDf`) so a degenerate
  * shingle cannot produce a quadratic bucket — the standard guard
  * against skew in similarity self-joins.
  */
object DedupOps {

  /** Exact dedup groups: hash-groupBy on md5(text). At 100 TB the
    * 128-bit digest group key keeps shuffle rows narrow (no full text
    * moves through the exchange). */
  def exactDupGroups(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs.select(col("doc_id"), md5(col("text")).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
      .orderBy(col("h"))
  }

  /** Distinct word n-gram shingles per document. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(trim(text), "\\s+")
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))) 
  }

  /** N-gram Jaccard similarity self-join (exact, oracle-checkable):
    * explode distinct shingles → drop shingles with document frequency
    * above `maxDf` → equi-join on shingle → per-pair common count →
    * Jaccard = common / (|A| + |B| - common) ≥ threshold.
    *
    * This IS the banded-equi-join shape the near-dup operators share;
    * the only difference vs MinHash-LSH is that the band key here is the
    * shingle itself (exact, more candidates) instead of a signature
    * band (approximate, fewer candidates).
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String,
                        n: Int = 3, threshold: Double = 0.8,
                        maxDf: Int = 50): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val docShingles = docs.select(
        col("doc_id"),
        explode(shingles(col("text"), n)).as("shingle"),
        size(shingles(col("text"), n)).as("n_shingles"))
    // document-frequency cap: guard against degenerate hot shingles
    val rare = docShingles
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))))
      .filter(col("df") <= maxDf)
      .drop("df")
    val pairs = rare.as("a").join(rare.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_shingles").as("na"), col("b.n_shingles").as("nb"))
      .agg(count(lit(1)).as("common"))
    pairs
      .withColumn("jaccard",
        round(col("common").cast("double") /
          (col("na") + col("nb") - col("common")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash signature: k permutations h_i(x) = (a_i * x + b_i) mod p
    * over a 64-bit base hash of each shingle (xxhash64 — codegen'd
    * native expression, no UDF). */
  private val mersennePrime = (1L << 61) - 1

  private def minhashSig(shingleArr: Column, k: Int): Column = {
    val sigs = (0 until k).map { i =>
      val a = 2 * i + 1     // odd multipliers; deterministic seeds
      val b = 982451653L * (i + 1) % mersennePrime
      // base hash folded to 32 bits so a*h+b stays inside a long under
      // ANSI overflow checking (a ≤ 2k, h < 2^32, b < 2^61 ⇒ < 2^62)
      array_min(transform(shingleArr,
        s => pmod(pmod(xxhash64(s), lit(1L << 32)) * lit(a) + lit(b), lit(mersennePrime))))
    }
    array(sigs: _*)
  }

  /** MinHash-LSH near-dup pairs: signature of `numHashes` minhashes
    * split into `bands` bands; documents agreeing on any full band
    * become candidates (equi-join on (band_idx, band_hash)); candidates
    * are verified with exact Jaccard over shingles. No SQL oracle
    * (xxhash64 is Spark-specific) — correctness is pinned by the
    * ScalaTest recall check against `ngramJaccardPairs`. */
  def minhashLshPairs(spark: SparkSession, dir: String,
                      n: Int = 3, numHashes: Int = 32, bands: Int = 8,
                      threshold: Double = 0.8): DataFrame = {
    val rowsPerBand = numHashes / bands
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), shingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val sigs = docs.select(col("doc_id"), col("sh"),
      minhashSig(col("sh"), numHashes).as("sig"))
    // band key = hash of the band's slice of the signature
    val banded = sigs.select(
        col("doc_id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
    // verify candidates with exact Jaccard (array intersection per pair)
    candidates
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", round(
        col("common") / (size(col("sh_a")) + size(col("sh_b")) - col("common")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash-64: per-token xxhash64, bitwise majority vote → 64-bit
    * fingerprint. Near-dup candidates share at least one of 4 16-bit
    * blocks (equi-join on block); verified by Hamming distance ≤ maxHamming.
    * No SQL oracle (xxhash64) — ScalaTest-pinned. */
  def simhash(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    val hashes = transform(array_distinct(toks), t => xxhash64(t))
    // for each bit: sum of (+1/-1) votes; bit set if positive
    val bits = (0 until 64).map { i =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)) > 0,
        lit(1L).cast("long") * lit(1L << i)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  def simhashPairs(spark: SparkSession, dir: String,
                   maxHamming: Int = 8): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), simhash(col("text")).as("sh"))
    // block b = 16-bit chunk b of the fingerprint; candidates share a block
    val blocked = docs.select(col("doc_id"), col("sh"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sh"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "block")
      .withColumnRenamed("col", "block_val")
    val candidates = blocked.as("a").join(blocked.as("b"),
        col("a.block") === col("b.block") &&
          col("a.block_val") === col("b.block_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
    candidates
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
