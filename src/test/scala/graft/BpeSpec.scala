package graft

import org.apache.spark.sql.functions._

import graft.ext.TextOps
import graft.operators.Relational

/** BPE merge mining (text_bpe_pairs / text_bpe_merges), the
  * snapshot-diff bookkeeping op (q_corpus_diff), and the binaryFile
  * landing-zone ingest (mm_binary_ingest). */
class BpeSpec extends SparkSuite {

  test("learned merges are argmax pair counts and concatenate their sides") {
    val merges = TextOps.bpeMerges(spark, sf, rounds = 3).collect()
    assert(merges.length == 3)
    merges.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i + 1L)
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0L)
    }
    // round 1's pair must be the bpePairs argmax (same statistic)
    val topPair = TextOps.bpePairs(spark, sf, k = 1).collect().head
    assert(merges.head.getString(3) == topPair.getString(0))
    assert(merges.head.getLong(4) == topPair.getLong(1))
  }

  test("bpeMerges learns hand-computed greedy merges on a planted adversarial corpus") {
    import spark.implicits._
    val dir = tmpDir("graft-bpe")
    // abab×3 (back-to-back pair run), aaa×2 (self-overlapping run),
    // cd×1 (noise). Hand-derived greedy BPE:
    //   round 1: (a,b) n=6  → abab = [ab, ab]
    //   round 2: (a,a) n=4  → aaa  = [aa, a]  (greedy, NOT [a, aa])
    //   round 3: (ab,ab) n=3 → abab = [abab]
    Seq((0L, "abab abab abab aaa aaa cd"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val merges = TextOps.bpeMerges(spark, dir, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(merges == Seq(
      (1L, "a", "b", "ab", 6L),
      (2L, "a", "a", "aa", 4L),
      (3L, "ab", "ab", "abab", 3L)))
    // fertility after those merges: abab → [abab] (1 sym), aaa → [aa, a]
    // (2 syms), cd → [c, d] (2 syms, never merged)
    val f = TextOps.bpeFertility(spark, dir, rounds = 3).collect().head
    assert(f.getLong(0) == 3L)                 // n_words
    assert(f.getLong(1) == 6L)                 // total_freq (3 + 2 + 1)
    assert(f.getLong(2) == 3 * 4 + 2 * 3 + 1 * 2) // chars_weighted = 20
    assert(f.getLong(3) == 3 * 1 + 2 * 2 + 1 * 2) // syms_weighted = 9
    assert(f.getDouble(4) == 0.45)             // 9 / 20
    // applying the tokenizer to the one-doc corpus: 6 words → 9 tokens
    val t = TextOps.bpeTokensPerDoc(spark, dir, rounds = 3).collect()
    assert(t.length == 1)
    assert((t.head.getLong(0), t.head.getLong(1), t.head.getLong(2),
      t.head.getDouble(3)) == ((0L, 6L, 9L, 1.5)))
    // compression trajectory: 20 → 14 → 12 → 9 weighted symbols
    val curve = TextOps.bpeCurve(spark, dir, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(curve == Seq((0L, 20L, 20L, 1.0), (1L, 14L, 20L, 0.7),
      (2L, 12L, 20L, 0.6), (3L, 9L, 20L, 0.45)))
  }

  test("corpus diff statuses partition both snapshots and match the derivation rules") {
    val byStatus = Relational.corpusDiff(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val nDocs = docs.length.toLong
    val removed = docs.count(_ % 13 == 0).toLong
    val changed = docs.count(id => id % 13 != 0 && id % 17 == 0).toLong
    val added = docs.count(_ % 19 == 0).toLong
    assert(byStatus("removed")._1 == removed)
    assert(byStatus("changed")._1 == changed)
    assert(byStatus("added")._1 == added)
    assert(byStatus("unchanged")._1 == nDocs - removed - changed)
    // added ids live in the synthetic re-crawl key range
    assert(byStatus("added")._2 >= 10000000L)
  }

  test("binaryFile ingest decodes the planted fixtures identically to the column chain") {
    val viaFiles = graft.ext.MultimodalOps.binaryIngest(spark, sf)
      .collect().map(_.toSeq).toSeq
    val viaColumns = graft.ext.MultimodalOps.mediaMeta(spark, sf)
      .filter(col("media_id") < 0)
      .collect().map(_.toSeq).toSeq
    assert(viaFiles == viaColumns)
  }
}
