package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.ext.DedupOps

/** Dedup operators: exact-dup detection on crafted duplicates, and
  * MinHash-LSH recall against the exact n-gram Jaccard join. */
class DedupSpec extends SparkSuite {

  /** A corpus with planted exact and near duplicates, written as a
    * documents.parquet so the dir-based API runs unchanged. */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val exactDups = base.filter(col("doc_id") < 5)
      .withColumn("doc_id", col("doc_id") + 100000L)  // same text, new id
    val nearDups = base.filter(col("doc_id") >= 5 && col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 200000L)
      .withColumn("text", concat(col("text"), lit(" tail tail tail")))
    val dir = tmpDir("graft-dedup")
    base.unionByName(exactDups).unionByName(nearDups)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact dedup finds exactly the planted duplicate texts") {
    val groups = DedupOps.exactDupGroups(spark, plantedDir)
      .filter(col("n_docs") > 1).collect()
    assert(groups.length == 5)
    groups.foreach(r => assert(r.getLong(1) == 2L))
    // keeper is always the original (smaller) id
    groups.foreach(r => assert(r.getLong(2) < 100000L))
  }

  test("incremental dedup: Bloom path is bit-identical to the plain anti-join") {
    // the planted corpus contains cross-split exact dups (same text under
    // ids 0-4 and 100000-100004 land in different md5-split halves with
    // high probability), so the anti-join is exercised, not vacuous
    val bloom = DedupOps.incrementalDedup(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val plain = DedupOps.incrementalDedupPlain(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(bloom == plain)
    // every kept row is a batch member whose digest is absent from the
    // historical side — replay the split predicate row-by-row
    val docs = spark.read.parquet(s"$plantedDir/documents.parquet")
      .select(col("doc_id"), md5(col("text")).as("digest"),
        (substring(md5(concat(lit(s"${DedupOps.incSplitSeed}:"),
          col("doc_id").cast("string"))), 1, 1) < lit(DedupOps.incBatchHex))
          .as("is_batch"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val histDigests = docs.collect { case (_, d, false) => d }.toSet
    val batch = docs.collect { case (id, d, true) => (id, d) }
    val expected = batch.groupBy(_._2).collect {
      case (d, rows) if !histDigests.contains(d) => (rows.map(_._1).min, d)
    }.toSeq.sortBy(_._1)
    assert(bloom == expected)
  }

  test("incremental near-dedup: sound (verified matches only) and complete on cross-split exact dups") {
    val rows = graft.ext.DedupOps.incrementalNearDedup(spark, plantedDir)
      .collect().map(r => (r.getLong(0),
        r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))
    def isBatch(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${DedupOps.incSplitSeed}:$id".getBytes("UTF-8"))
      f"${md(0) & 0xff}%02x".charAt(0) < DedupOps.incBatchHex.charAt(0)
    }
    val texts = spark.read.parquet(s"$plantedDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // one row per batch doc; kept <=> no match; nearest_hist is historical
    assert(rows.map(_._1).toSet == texts.keySet.filter(isBatch))
    rows.foreach { case (_, n, nearest, kept) =>
      assert(kept == (n == 0L))
      if (n > 0) assert(!isBatch(nearest))
    }
    // soundness: every reported nearest match really is >= 0.8 Jaccard
    def shingles(t: String): Set[String] =
      t.trim.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    rows.filter(_._2 > 0).foreach { case (id, _, nearest, _) =>
      val (a, b) = (shingles(texts(id)), shingles(texts(nearest)))
      val j = a.intersect(b).size.toDouble / a.union(b).size
      assert(j >= 0.8, s"batch $id vs hist $nearest jaccard $j")
    }
    // completeness on identical text: an exact copy straddling the split
    // shares every band, so the batch side MUST be flagged
    val byText = texts.groupBy(_._2).values.filter(_.size > 1)
    val straddling = byText.flatMap { g =>
      val ids = g.keys.toSeq
      ids.filter(isBatch).filter(b => ids.exists(h => !isBatch(h))).map(_ -> g)
    }
    straddling.foreach { case (batchId, _) =>
      val row = rows.find(_._1 == batchId).get
      assert(row._2 >= 1L, s"cross-split exact dup $batchId not flagged")
    }
  }

  test("ngram Jaccard finds planted near-dups (appended-tail docs)") {
    val pairs = DedupOps.ngramJaccardPairs(spark, plantedDir, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (5L until 10L).foreach { id =>
      assert(pairs.contains((id, id + 200000L)) ||
        pairs.exists(p => p._1 == id && p._2 == id + 200000L),
        s"missing planted near-dup pair for doc $id")
    }
  }

  test("MinHash-LSH recall ≥ 0.8 vs exact Jaccard at t=0.8, zero false positives after verify") {
    val exact = DedupOps.ngramJaccardPairs(spark, sf, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = DedupOps.minhashLshPairs(spark, sf, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verify step keeps only true-Jaccard≥t pairs ⇒ lsh ⊆ exact
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact)}")
    if (exact.nonEmpty) {
      val recall = lsh.intersect(exact).size.toDouble / exact.size
      assert(recall >= 0.8, s"recall $recall over ${exact.size} true pairs")
    }
  }

  test("simhashPairs equals an exact Hamming self-join (block scheme is exhaustive at radius 8)") {
    import spark.implicits._
    val maxHamming = 8
    val fps = spark.read.parquet(s"$plantedDir/documents.parquet")
      .select(col("doc_id"), DedupOps.simhash("text").as("h"))
    // exact ground truth: all-pairs Hamming join (test-only; tiny corpus)
    val exact = fps.as("a").crossJoin(fps.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .filter(bit_count(col("a.h").bitwiseXOR(col("b.h"))) <= maxHamming)
      .select(col("a.doc_id"), col("b.doc_id"))
      .as[(Long, Long)].collect().toSet
    val banded = DedupOps.simhashPairs(spark, plantedDir, maxHamming)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // pigeonhole over maxHamming+1 blocks guarantees candidate recall,
    // and verification filters to true pairs ⇒ exact set equality
    assert(banded == exact,
      s"missed: ${exact.diff(banded).take(5)}; spurious: ${banded.diff(exact).take(5)}")
    // the planted exact dups guarantee the ground truth is non-trivial
    assert(exact.nonEmpty)
  }

  test("md5-60 kernel matches the portable SQL formulation; md5-mode blocking stays exhaustive") {
    import spark.implicits._
    // the engine-neutral contract: kernel md5_60(s) == the conv/substr
    // SQL form every engine can compute
    val strs = spark.range(200).selectExpr("concat('tok_', id) AS s")
      .selectExpr("s", "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) AS h")
      .as[(String, Long)].collect()
    strs.foreach { case (s, h) =>
      assert(graft.functions.TextHashUtil.md5_60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)) == h, s)
    }
    // exhaustiveness holds in md5 mode too: banded result == exact
    // Hamming self-join over the md5-mode fingerprints
    val fps = spark.read.parquet(s"$plantedDir/documents.parquet")
      .select(col("doc_id"), DedupOps.simhash("text", md5Mode = true).as("h"))
    val exact = fps.as("a").crossJoin(fps.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .filter(bit_count(col("a.h").bitwiseXOR(col("b.h"))) <= 8)
      .select(col("a.doc_id"), col("b.doc_id"))
      .as[(Long, Long)].collect().toSet
    val banded = DedupOps.simhashPairs(spark, plantedDir, 8, md5Mode = true)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(banded == exact)
  }

  test("dedup clusters: every paired doc labeled, exactly one keeper per cluster, pairs co-clustered") {
    import spark.implicits._
    val pairs = DedupOps.ngramJaccardPairs(spark, plantedDir, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val clusters = DedupOps.dedupClusters(spark, plantedDir, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // every doc in a pair got a label; both ends share a cluster
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split across clusters")
    }
    // exactly one keeper per cluster, and it is the min doc_id
    clusters.groupBy(_._2._1).foreach { case (cl, members) =>
      val keepers = members.filter(_._2._2).keys.toSeq
      assert(keepers == Seq(cl), s"cluster $cl keepers=$keepers")
      assert(members.keys.min == cl)
    }
  }

  test("keeper weights preserve the corpus count: sum = N, losers 0, unclustered 1") {
    val docs = spark.read.parquet(s"$plantedDir/documents.parquet")
    val n = docs.count()
    val w = DedupOps.keeperWeights(spark, plantedDir, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w.size == n, "one weight row per document")
    assert(w.values.map(BigInt(_)).sum == n, "count preservation: sum(weight) = N")
    val clusters = DedupOps.dedupClusters(spark, plantedDir, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    clusters.foreach { case (doc, (cl, isKeeper)) =>
      val size = clusters.count(_._2._1 == cl)
      assert(w(doc) == (if (isKeeper) size.toLong else 0L),
        s"doc $doc keeper=$isKeeper cluster=$cl size=$size weight=${w(doc)}")
    }
    (w.keySet -- clusters.keySet).foreach { doc =>
      assert(w(doc) == 1L, s"unclustered doc $doc weight=${w(doc)}")
    }
  }

  test("native kernels are bit-identical to the composable formulations they replace") {
    val raw = spark.read.parquet(s"$plantedDir/documents.parquet")
    assert(raw.select(
        DedupOps.shingles(col("text"), 3).as("a"),
        DedupOps.shinglesComposable(col("text"), 3).as("b"))
      .filter(not(col("a") === col("b"))).count() == 0, "shingles diverge")
    assert(raw.select(
        DedupOps.simhash("text").as("a"),
        DedupOps.simhashComposable("text").as("b"))
      .filter(col("a") =!= col("b")).count() == 0, "simhash diverges")
    assert(raw.select(DedupOps.shingles(col("text"), 3).as("sh"))
      .select(
        DedupOps.minhashSig("sh", 32).as("a"),
        DedupOps.minhashSigComposable("sh", 32).as("b"))
      .filter(not(col("a") === col("b"))).count() == 0, "minhash sig diverges")
  }

  test("word_shingles/simhash64/minhash_sig are callable from SQL (GraftExtensions)") {
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("docs_sql")
    val r = spark.sql(
      """SELECT doc_id, size(word_shingles(text, 3)) AS n_sh,
        |       simhash64(text) AS fp,
        |       size(minhash_sig(word_shingles(text, 3), 16)) AS n_sig
        |FROM docs_sql ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(r.length == 5)
    assert(r.forall(_.getInt(r.head.fieldIndex("n_sig")) == 16))
    // the graph kernels are SQL-callable too
    val pp = spark.sql(
      "SELECT packed_pairs(array(1L, 2L, 5L)) AS pp, edit_within1('ab', 'ax') AS e")
      .collect().head
    assert(pp.getAs[scala.collection.Seq[Long]]("pp").toSeq ==
      Seq((1L << 32) + 2L, (1L << 32) + 5L, (2L << 32) + 5L))
    assert(pp.getAs[Boolean]("e"))
  }

  test("simhash of identical texts is identical; hamming to a perturbed copy is small") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota")).toDF("doc_id", "text")
    val hs = df.select(col("doc_id"), DedupOps.simhash("text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(2L))
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(3L)) <= 16)
  }

  test("contamination flags exactly the docs sharing an n-gram with the eval set") {
    val spark2 = spark
    import spark2.implicits._
    // doc 11 contains eval doc 1's 3-gram verbatim; 12 shares nothing
    val eval = Seq((1L, "secret eval question one")).toDF("doc_id", "text")
    val train = Seq(
      (11L, "padding secret eval question one more padding"),
      (12L, "completely unrelated training text here")).toDF("doc_id", "text")
    val out = DedupOps.contamination(train, eval, n = 3, hashed = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq((11L, 2L, true), (12L, 0L, false)))
  }

  test("hashed contamination face equals the string-gram oracle face") {
    val docs = graft.model.Tables.documents(spark, sf)
    val eval = docs.filter(col("source") === "src0")
    val train = docs.filter(col("source") =!= "src0")
    val hashed = DedupOps.contamination(train, eval, n = 5, hashed = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val strings = DedupOps.contamination(train, eval, n = 5, hashed = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hashed == strings)
  }

  test("fuzzy join equals the brute-force edit-distance definition") {
    def lev(a: String, b: String): Int = {
      val prev = Array.range(0, b.length + 1)
      val cur = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length) {
          val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
          cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        }
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    val names = graft.model.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val want = names.map { case (id, n) =>
      val nbrs = names.filter { case (oid, on) => oid != id && lev(n, on) <= 1 }
      id -> nbrs
    }.filter(_._2.nonEmpty)
      .map { case (id, nbrs) => id -> ((nbrs.length.toLong, nbrs.map(_._1).min)) }
      .toMap
    val got = DedupOps.editDistanceNeighbors(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }

  test("edit_within2 kernel equals the full DP on adversarial pairs") {
    import org.apache.spark.unsafe.types.UTF8String
    def lev(a: String, b: String): Int = {
      val prev = Array.range(0, b.length + 1)
      val cur = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length) {
          val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
          cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        }
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    val cases = Seq(
      ("", ""), ("", "ab"), ("", "abc"), ("a", "a"), ("ab", "ba"),
      ("abcdef", "abcdef"), ("abcdef", "abdcef"),     // transposition = 2
      ("abcdef", "xbcdey"),                            // subs at both ends
      ("abcdef", "bcdefa"), ("abcdef", "abcf"),        // rotate / 2 dels
      ("abcdef", "aXbcdeYf"), ("abcdef", "abXdYf"),
      ("aaaaaa", "aaabaa"), ("aaaaaa", "bbaaaa"), ("aaaaaa", "aaa"),
      ("Customer#000000017", "Customer#000000071"),
      ("Customer#000000017", "Customer#000000999"),
      ("café crème", "cafe creme"),          // multi-byte subs
      ("ab😀cd", "abcd"),                    // astral deletion
      ("abcdefgh", "hgfedcba"))
    for ((a, b) <- cases; (x, y) <- Seq((a, b), (b, a))) {
      val got = graft.functions.TextHashUtil.editWithin2(
        UTF8String.fromString(x), UTF8String.fromString(y))
      // lev over chars differs from codepoints only for astral pairs —
      // recompute over codepoints for the reference
      val cp = lev(new String(x.codePoints.toArray.map(_.toChar)),
        new String(y.codePoints.toArray.map(_.toChar)))
      assert(got == (cp <= 2), s"editWithin2('$x','$y') = $got, lev = $cp")
    }
  }

  test("fastss d=2 blocking is complete: face equals brute force at distance <= 2") {
    def lev(a: String, b: String): Int = {
      val prev = Array.range(0, b.length + 1)
      val cur = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length) {
          val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
          cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        }
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    val names = graft.model.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val want = names.map { case (id, n) =>
      val nbrs = names.filter { case (oid, on) => oid != id && lev(n, on) <= 2 }
      id -> nbrs
    }.filter(_._2.nonEmpty)
      .map { case (id, nbrs) => id -> ((nbrs.length.toLong, nbrs.map(_._1).min)) }
      .toMap
    val got = DedupOps.editDistanceNeighbors2(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }

  test("connected components: 1024-edge path converges in logarithmic rounds") {
    import spark.implicits._
    // the worst case for plain min-label propagation (O(diameter)
    // rounds); large-star/small-star must close it logarithmically
    val d = 1024
    val path = (0 until d).map(i => (i.toLong, i + 1L)).toDF("doc_a", "doc_b")
    // force the distributed loop: 1024 edges would otherwise take the
    // size-gated driver union-find and never exercise LS/SS
    val (labels, rounds) =
      DedupOps.ccLabelsCounted(spark, path, useDriverGate = false)
    val lbl = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl.size == d + 1, "every endpoint labeled exactly once")
    assert(lbl.values.forall(_ == 0L), "single component, min label 0")
    val bound = (math.log(d.toDouble) / math.log(2.0)).ceil.toInt + 4
    assert(rounds <= bound, s"path-$d took $rounds LS+SS rounds > bound $bound")
  }

  test("connected components: random graph labels equal a union-find replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val raw = Seq.fill(400)((rnd.nextInt(250).toLong, rnd.nextInt(250).toLong))
    val pairs = raw.filter { case (a, b) => a != b }
    // high-id star center mixed in: a hub whose neighbors are all smaller
    val star = (0 until 30).map(i => (240L, i.toLong * 3))
    val all = (pairs ++ star).distinct
    // BOTH modes must produce identical labels: the size-gated driver
    // union-find (default at this size) and the distributed LS/SS loop
    val (labels, gateRounds) =
      DedupOps.ccLabelsCounted(spark, all.toDF("doc_a", "doc_b"))
    assert(gateRounds == 0, "expected the driver-gate path at 430 edges")
    val (labelsDist, _) = DedupOps.ccLabelsCounted(
      spark, all.toDF("doc_a", "doc_b"), useDriverGate = false)
    assert(labels.collect().map(_.toSeq).toSet ==
      labelsDist.collect().map(_.toSeq).toSet,
      "driver-gate labels differ from the distributed loop")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    all.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = all.flatMap(p => Seq(p._1, p._2)).distinct
    val want = nodes.map { n =>
      val root = find(n)
      n -> nodes.filter(m => find(m) == root).min
    }.toMap
    assert(got == want)
  }

  test("duplicated spans: randomized corpora equal an independent brute-force replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    val vocab = Vector("aa", "b", "ccc", "dd", "e", "fff", "g", "hh")
    // small vocab + short docs → dense window collisions, the regime
    // where interval merging actually exercises every branch
    val docs = (0L until 40L).map { id =>
      val n = 5 + rnd.nextInt(12)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "),
        "en", "s0", 0L)
    }
    val dir = tmpDir("graft-spans-prop")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val got = DedupOps.duplicatedSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    // brute-force replay: count every K-window occurrence corpus-wide,
    // then merge qualifying [start, end) intervals per doc
    val k = DedupOps.spanK
    val split = docs.map { case (id, text, _, _, _) =>
      id -> text.split("\\s+").toSeq
    }
    val occ = scala.collection.mutable.Map.empty[String, Int]
    split.foreach { case (_, ws) =>
      ws.sliding(k).filter(_.length == k)
        .foreach(g => occ(g.mkString(" ")) =
          occ.getOrElse(g.mkString(" "), 0) + 1)
    }
    split.foreach { case (id, ws) =>
      val starts = ws.scanLeft(0L)((acc, w) => acc + w.length + 1).init
      val spans = ws.sliding(k).zipWithIndex
        .filter(_._1.length == k)
        .map { case (g, i) =>
          (starts(i), starts(i) + g.mkString(" ").length, g.mkString(" "))
        }
        .filter { case (_, _, g) => occ(g) >= DedupOps.spanMinOccur }
        .map { case (s, e, _) => (s, e) }.toSeq
      var covered = 0L
      var nWin = spans.length.toLong
      var curS = -1L; var curE = -1L
      spans.sortBy(_._1).foreach { case (s, e) =>
        if (s > curE) { if (curE >= 0) covered += curE - curS; curS = s; curE = e }
        else curE = math.max(curE, e)
      }
      if (curE >= 0) covered += curE - curS
      val canon = ws.map(_.length).sum.toLong + ws.length - 1
      val want = (ws.length.toLong, nWin, covered, canon,
        if (canon > 0) covered.toDouble / canon.toDouble else 0.0)
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
  }

  test("duplicated spans: hand-computed interval unions (cross-doc, overlap merge, within-doc repeat)") {
    import spark.implicits._
    // K = 5, minOccur = 2 (DedupOps.spanK/spanMinOccur)
    val docs = Seq(
      // docs 1+2 share exactly one window "a b c d e" → span (0,9) each
      (1L, "a b c d e f g h", "en", "s0", 15L),
      (2L, "a b c d e x y z", "en", "s0", 15L),
      // doc 3: all windows unique → zero coverage
      (3L, "p q r s t u", "en", "s0", 11L),
      // docs 4+5 identical: 3 overlapping dup windows merge to (0,13)
      (4L, "m n o p q r s", "en", "s0", 13L),
      (5L, "m n o p q r s", "en", "s0", 13L),
      // doc 6: the SAME window twice within one doc (ExactSubstr counts
      // within-doc repeats) → two disjoint islands (0,9) and (13,22)
      (6L, "k l m n o zz k l m n o", "en", "s0", 22L))
    val dir = tmpDir("graft-spans")
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val got = DedupOps.duplicatedSpans(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(got(1L) == ((8L, 1L, 9L, 15L, 9.0 / 15)))
    assert(got(2L) == ((8L, 1L, 9L, 15L, 9.0 / 15)))
    assert(got(3L) == ((6L, 0L, 0L, 11L, 0.0)))
    assert(got(4L) == ((7L, 3L, 13L, 13L, 1.0)))
    assert(got(5L) == ((7L, 3L, 13L, 13L, 1.0)))
    assert(got(6L) == ((11L, 2L, 18L, 22L, 18.0 / 22)))
  }

  test("LSH eval identities: hits = verified pairs, truth = exact pairs, micro rates") {
    val r = DedupOps.lshEval(spark, sf).collect()
    assert(r.length == 1)
    val (nTruth, nCand, nHit) = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2))
    // the verified LSH output IS candidates ∩ truth, so its count must
    // equal the hit count; the truth count must equal the exact face
    assert(nHit == DedupOps.minhashLshPairs(spark, sf, md5Mode = true).count())
    assert(nTruth == DedupOps.ngramJaccardPairs(spark, sf).count())
    assert(nCand >= nHit && nTruth >= nHit)
    assert(r(0).getLong(3) == nHit * 1000000L / nTruth)
    assert(r(0).getLong(4) == nHit * 1000000L / nCand)
    // the measurement is non-vacuous at the gate SF
    assert(nTruth > 0 && nCand > nHit)
  }
}
