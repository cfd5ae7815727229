package graft

import org.apache.spark.sql.functions._

import graft.ext.TextOps

/** Pins the text-analysis additions: Gopher-style repetition signals on
  * hand-built documents with known n-gram structure, and PII scrubbing
  * on planted fixtures. */
class TextOpsSpec extends SparkSuite {

  test("repetition signals on hand-built docs") {
    val spark2 = spark
    import spark2.implicits._
    // 22 distinct tokens -> 21 distinct bigrams (tbf = 1/21 < 0.05), no
    // duplicate trigrams -> the one "keep" doc in this fixture
    val clean = ('a' to 'v').mkString(" ")
    val out = dir(Seq(
      (0L, clean),
      // "x y x y x y": trigrams = {xyx, yxy, xyx, yxy} -> 4 with 2 distinct
      // bigrams = {xy, yx, xy, yx, xy} -> top "x y" 3/5
      (1L, "x y x y x y"),
      // short doc: fewer than 3 tokens -> dup3 = 0
      (2L, "hello world")))
    val r = out.sortBy(_.getAs[Long]("doc_id"))
    assert(r(0).getAs[Double]("dup_trigram_frac") == 0.0)
    assert(r(0).getAs[Double]("top_bigram_frac") == 1.0 / 21)
    assert(r(1).getAs[Double]("dup_trigram_frac") == 0.5)
    assert(r(1).getAs[Double]("top_bigram_frac") == 0.6)
    assert(r(2).getAs[Double]("dup_trigram_frac") == 0.0)
    assert(r(2).getAs[Double]("top_bigram_frac") == 1.0)
    assert(r(0).getAs[Boolean]("keep"))
    assert(!r(1).getAs[Boolean]("keep"))
  }

  private def dir(docs: Seq[(Long, String)]): Array[org.apache.spark.sql.Row] = {
    val spark2 = spark
    import spark2.implicits._
    val d = tmpDir("textops")
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    TextOps.repetitionSignals(spark, d).collect()
  }

  test("DSIR selection prefers target-vocabulary documents and skips empty ones") {
    val spark2 = spark
    import spark2.implicits._
    val d = tmpDir("textops-dsir")
    val targetVocab = "alpha beta gamma delta epsilon"
    val otherVocab = "zork quux blarg wibble frotz"
    val docs =
      // the target slice (defines the reference distribution)
      (0L until 5L).map(i => (i, targetVocab, TextOps.dsirTargetSource)) ++
        // raw pool: 5 target-like docs, 15 alien-vocabulary docs, 1
        // empty — 25 SCORED docs total (the empty one never scores), so
        // the p75 threshold index 0.75·24 = 18 lands exactly on the
        // target-like tier (indices 15-19 ascending), no interpolation
        (5L until 10L).map(i => (i, targetVocab + " beta gamma", "raw")) ++
        (10L until 25L).map(i => (i, otherVocab + " quux zork", "raw")) ++
        Seq((25L, "", "raw"))
    docs.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = TextOps.dsirScores(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    // every target-like raw doc outscores every alien-vocabulary doc
    val targetLike = (5L until 10L).map(rows(_)._1)
    val alien = (10L until 25L).map(rows(_)._1)
    assert(targetLike.min > alien.max,
      s"target-like ${targetLike.toList} !> alien ${alien.toList}")
    // top-quartile selection keeps the target-like docs, drops aliens
    assert((5L until 10L).forall(rows(_)._2), s"target-like not selected: $rows")
    assert((10L until 25L).forall(i => !rows(i)._2), "alien docs selected")
    // the empty doc carries no evidence and is never selected
    assert(rows(25L) == (0L, false))
  }

  test("chunkDocuments: coverage, overlap, and reconstruction invariants") {
    val spark2 = spark
    import spark2.implicits._
    val d = tmpDir("textops-chunks")
    // doc 0: 10 tokens < window -> 1 chunk; doc 1: exactly one stride
    // past the window boundary; doc 2: (n-w) % s == 0 exact tiling
    val doc1 = (1 to 100).map(i => s"t$i").mkString(" ")   // ceil(36/48)+1 = 2
    val doc2 = (1 to 160).map(i => s"u$i").mkString(" ")   // (160-64)/48=2 -> 3
    Seq((0L, "a b c d e f g h i j"), (1L, doc1), (2L, doc2))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextOps.chunkDocuments(spark, d).collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id")).view.mapValues(
      _.sortBy(_.getAs[Long]("chunk_id"))).toMap
    assert(byDoc(0L).length == 1 && byDoc(1L).length == 2 && byDoc(2L).length == 3)
    // short doc: the single chunk IS the document
    assert(byDoc(0L).head.getAs[String]("chunk_text") == "a b c d e f g h i j")
    // every chunk: start = id*stride, len = min(window, n - start), and
    // the text has exactly len tokens
    out.foreach { r =>
      val (id, st, ln) = (r.getAs[Long]("chunk_id"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("chunk_len"))
      assert(st == id * 48)
      assert(r.getAs[String]("chunk_text").split(" ").length == ln)
    }
    // tail coverage: last chunk of doc1 ends at token 100
    val last1 = byDoc(1L).last
    assert(last1.getAs[Long]("start_tok") + last1.getAs[Long]("chunk_len") == 100)
    assert(last1.getAs[String]("chunk_text").endsWith("t100"))
    // overlap: consecutive chunks share window - stride = 16 tokens
    val c2 = byDoc(2L)
    assert(c2(0).getAs[String]("chunk_text").split(" ").drop(48).toSeq ==
      c2(1).getAs[String]("chunk_text").split(" ").take(16).toSeq)
    // exact tiling: doc2's last chunk is full-width
    assert(c2(2).getAs[Long]("chunk_len") == 64)
  }

  test("vocabCoverage: hand-built zipf-ish corpus covers exactly as computed") {
    val spark2 = spark
    import spark2.implicits._
    val d = tmpDir("textops-vocab")
    // token "a" x 6, "b" x 3, then c..z once each (24 singletons):
    // total 33 occurrences, top-1 covers 6, top-2 covers 9
    val text = ("a a a a a a b b b " + ('c' to 'z').mkString(" ")).trim
    Seq((0L, text)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = graft.ext.TextOps.vocabCoverage(spark, d, ks = Seq(1, 2, 100))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, 6L, 33L, math.rint(6.0 / 33 * 1e6) / 1e6),
      (2L, 9L, 33L, math.rint(9.0 / 33 * 1e6) / 1e6),
      (100L, 33L, 33L, 1.0)), out.mkString(", "))
  }

  test("noveltyScores: unique docs score 1, cloned docs score 0") {
    val spark2 = spark
    import spark2.implicits._
    val d = tmpDir("textops-novelty")
    val unique = (1 to 30).map(i => s"w$i").mkString(" ")
    val clonA = (1 to 30).map(i => s"c$i").mkString(" ")
    Seq((0L, unique), (1L, clonA), (2L, clonA))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextOps.noveltyScores(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("novelty")).toMap
    assert(out(0L) == 1.0)  // no shingle shared with any other doc
    assert(out(1L) == 0.0 && out(2L) == 0.0)  // every shingle in the twin
  }

  test("lmScore: corpus-typical docs outscore gibberish; exact BigInt replay") {
    val spark2 = spark
    import spark2.implicits._
    val d = tmpDir("textops-lm")
    // 10 docs of the same common phrase, 1 gibberish doc of singletons
    val common = "the cat sat on the mat"
    val gibberish = (1 to 6).map(i => s"zq$i").mkString(" ")
    val rows = (0L to 9L).map(i => (i, common)) :+ (10L, gibberish)
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextOps.lmScore(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.size == 11)
    // common docs: every bigram seen 10x; gibberish: all singletons
    assert(out(0L)._3 > out(10L)._3)
    assert(out(10L)._2 == 5L) // all 5 gibberish bigrams are singletons
    assert(out(0L)._2 == 0L)
    // exact replay of doc 0 with BigInt arithmetic: bigrams of `common`
    // each occur 10 times corpus-wide; heads' c_a counted over all docs
    val toks = common.split(" ")
    val allToks = rows.flatMap(_._2.split(" "))
    val vocab = allToks.distinct.size
    val bigrams = rows.flatMap { case (_, t) =>
      val w = t.split(" "); w.init.zip(w.tail) }
    val cab = bigrams.groupBy(identity).view.mapValues(_.size).toMap
    val caM = bigrams.groupBy(_._1).view.mapValues(_.size).toMap
    val pqs = toks.init.zip(toks.tail).map { bgm =>
      (BigInt(cab(bgm) + 1) * 1048576) / (caM(bgm._1) + vocab) }
    val expected = BigDecimal(pqs.sum.toDouble / (pqs.length * 1048576.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0L)._3 == expected)
  }

  test("scrubEmails masks planted addresses and leaves clean text alone") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      "contact alice.smith+x@example.co.uk for details",
      "no address here",
      "two: a@b.io and c_d@e-f.org end").toDF("text")
    val out = df.select(TextOps.scrubEmails(col("text")).as("t"))
      .as[String].collect()
    assert(out(0) == "contact <EMAIL> for details")
    assert(out(1) == "no address here")
    assert(out(2) == "two: <EMAIL> and <EMAIL> end")
  }

  test("tfidf log face matches hand-computed tf*ln(N/df), fp face exact integer math") {
    val logFace = TextOps.tfIdfTopTerms(spark, sf, k = 3, logIdf = true).collect()
    assert(logFace.nonEmpty)
    val total = graft.model.Tables.documents(spark, sf).count().toDouble
    logFace.foreach { r =>
      val tf = r.getAs[Long]("tf").toDouble
      val df = r.getAs[Long]("df").toDouble
      val expected = tf * math.log(total / df)
      assert(math.abs(r.getAs[Double]("score_fp") - expected) < 1e-9,
        s"tfidf mismatch for token ${r.getAs[String]("token")}")
    }
    // the fixed-point face scores exactly tf*((N*1e6) div df)
    val fp = TextOps.tfIdfTopTerms(spark, sf, k = 3, logIdf = false).collect()
    val n = total.toLong
    fp.foreach { r =>
      val expected = r.getAs[Long]("tf") * ((n * 1000000L) / r.getAs[Long]("df"))
      assert(r.getAs[Long]("score_fp") == expected)
    }
  }

  test("token_stats / token_hits kernels match the composable HOF forms") {
    import org.apache.spark.sql.functions._
    val docs = graft.model.Tables.documents(spark, sf).select("doc_id", "text")
    val toks = split(trim(col("text")), "\\s+")
    val stop = TextOps.stopwords
    val hof = docs.select(col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      size(filter(toks, t => t.isin(stop.map(_.toString): _*)))
        .cast("long").as("n_stop"))
    val kern = docs.select(col("doc_id"),
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.TokenStats(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("text")),
          stop)).as("st"))
      .select(col("doc_id"), col("st.n_tokens").as("n_tokens"),
        col("st.n_distinct").as("n_distinct"), col("st.n_stop").as("n_stop"))
    assert(hof.exceptAll(kern).isEmpty && kern.exceptAll(hof).isEmpty)
    // token_hits: per-marker-set counts equal independent HOF counts,
    // and the empty-string edge tokenizes to [""] in both forms
    val markers = TextOps.langMarkers.toSeq.sortBy(_._1)
    val edge = spark.createDataFrame(Seq((1L, ""), (2L, "the the le"),
      (3L, " el  los "))).toDF("doc_id", "text")
    val hofHits = edge.select(col("doc_id") +: markers.zipWithIndex.map {
      case ((_, ms), i) =>
        size(filter(split(trim(col("text")), "\\s+"),
          t => t.isin(ms.map(_.toString): _*))).cast("long").as(s"h$i")
    }: _*)
    val kernHits = edge.select(col("doc_id"),
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.functions.TokenHits(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("text")),
          markers.map(_._2))).as("h"))
      .select(col("doc_id") +: markers.indices.map(i =>
        element_at(col("h"), i + 1).as(s"h$i")): _*)
    assert(hofHits.exceptAll(kernHits).isEmpty && kernHits.exceptAll(hofHits).isEmpty)
  }

  test("scrubIds masks every digit and counts them") {
    val names = graft.model.Tables.customer(spark, sf)
      .select("c_custkey", "c_name").collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[String]("c_name")).toMap
    val r = TextOps.scrubIds(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val name = names(row.getAs[Long]("c_custkey"))
      assert(row.getAs[String]("name_masked") == name.replaceAll("[0-9]", "#"))
      assert(row.getAs[Long]("n_masked") == name.count(_.isDigit))
    }
  }

  test("inverted index postings are sorted, de-duplicated, and df-banded") {
    val rows = TextOps.invertedIndex(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length > 100, s"expected a real phrase vocabulary, got ${rows.length}")
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      assert(df >= 3 && df <= 20)
      val ids = r.getAs[String]("postings").split(",").map(_.toLong)
      // df counts exactly the documents in the posting list, which is
      // strictly increasing (sorted + per-doc distinct shingles upstream)
      assert(ids.length == df, s"${r.getAs[String]("phrase")}: $df vs ${ids.length}")
      assert(ids.sameElements(ids.sorted) && ids.distinct.length == ids.length)
    }
  }

  test("boilerplate scrub drops the planted shared header, keeps unique content") {
    val spark2 = spark
    import spark2.implicits._
    val d = tmpDir("textops-boiler")
    // an 8-token "header" shared by 4 docs (df=4 > maxDf=2) followed by
    // unique bodies; doc 10 is NOTHING but the header (all-boilerplate);
    // doc 11 shares a body chunk with doc 12 only (df=2 <= maxDf: kept)
    val header = "terms of service apply to all rights reserved"  // 8 tokens
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    def body(tag: String) = (1 to 8).map(i => s"$tag$i").mkString(" ")
    Seq(
      (1L, s"$header ${body("a")}"),
      (2L, s"$header ${body("b")}"),
      (3L, s"$header ${body("c")}"),
      (10L, header),
      (11L, s"$header $shared"),
      (12L, s"$shared ${body("d")}"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextOps.boilerplateScrub(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dropped"),
          r.getAs[String]("clean_text")))).toMap
    // header chunk dropped everywhere (df=4); bodies intact
    assert(out(1L) == ((2L, 1L, body("a"))))
    assert(out(2L) == ((2L, 1L, body("b"))))
    assert(out(3L) == ((2L, 1L, body("c"))))
    // all-boilerplate doc: every chunk dropped, clean_text is null
    assert(out(10L) == ((1L, 1L, null)))
    // df=2 chunk survives the default maxDf=2 threshold in both docs
    assert(out(11L) == ((2L, 1L, shared)))
    assert(out(12L) == ((2L, 0L, s"$shared ${body("d")}")))
  }

  test("source drift: the planted skewed source scores far above conforming ones") {
    val spark2 = spark
    import spark2.implicits._
    val d = tmpDir("textops-drift")
    // sources a/b draw from the same distribution; source z is spam
    // (one token repeated) — its chi2 must dominate
    val normal = "alpha beta gamma delta epsilon"
    val docs =
      (1 to 10).map(i => (i.toLong, normal, "a")) ++
      (11 to 20).map(i => (i.toLong, normal, "b")) ++
      (21 to 30).map(i => (i.toLong, "spam spam spam spam spam", "z"))
    docs.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextOps.sourceDrift(spark, d).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out.keySet == Set("a", "b", "z"))
    // a and b are identical to each other (and half the corpus is
    // spam, so both carry SOME drift vs the blended baseline — but
    // symmetric: equal scores), z is the outlier by a wide margin
    assert(out("a") == out("b"))
    assert(out("z") > out("a") * 1.5, s"spam source not flagged: $out")
    // non-negativity (chi-squared is a sum of squares)
    out.values.foreach(v => assert(v >= 0.0))
  }

  test("boilerplate scrub round-trips every document when nothing repeats") {
    val spark2 = spark
    import spark2.implicits._
    val d = tmpDir("textops-boiler-rt")
    // all-unique tokens across varied lengths that exercise the chunk
    // boundary arithmetic (1, W-1, W, W+1, 2W, 2W+3 tokens)
    val docs = Seq(1, 7, 8, 9, 16, 19).zipWithIndex.map { case (n, ix) =>
      (ix.toLong, (1 to n).map(i => s"w${ix}_$i").mkString(" "))
    }
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = TextOps.boilerplateScrub(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_dropped"), r.getAs[String]("clean_text")))).toMap
    docs.foreach { case (id, text) =>
      assert(out(id) == ((0L, text)), s"doc $id did not round-trip")
    }
  }

  test("corpus card: hand-computed per-source volume, language mix, and cross-source dup flags") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = tmpDir("graft-card")
    val shared = "alpha beta gamma delta"
    Seq(
      (1L, shared, "en", "s0"),
      (2L, shared, "en", "s0"),          // in-source exact dup of 1
      (3L, "epsilon zeta eta", "de", "s0"),
      (4L, shared, "fr", "s1"))          // CROSS-source dup of 1/2
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val card = TextOps.corpusCard(spark, d).collect()
      .map(r => r.getString(0) -> r).toMap
    val s0 = card("s0")
    assert(s0.getLong(1) == 3L)          // n_docs
    assert(s0.getLong(2) == 4L + 4L + 3L) // n_tokens
    assert(s0.getLong(4) == 2L)          // n_langs (en, de)
    assert(s0.getString(5) == "en")      // top_lang by count
    assert(s0.getLong(6) == 2L)          // both copies of the dup text
    assert(s0.getDouble(7) == 2.0 / 3.0)
    val s1 = card("s1")
    // the single s1 doc is flagged because its digest repeats in s0
    assert(s1.getLong(1) == 1L && s1.getLong(6) == 1L &&
      s1.getDouble(7) == 1.0)
    assert(s1.getString(5) == "fr" && s1.getLong(4) == 1L)
  }

  test("pretrain capstone equals its components composed by hand") {
    import org.apache.spark.sql.functions.col
    val pred = TextOps.qualityLrScores(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val frac = graft.ext.DedupOps.duplicatedSpans(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.trim(col("text")), "\\s+"))
          .cast("long").as("nt"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = docs.groupBy(_._2).map { case (src, rows) =>
      val kept = rows.filter { case (id, _, _) =>
        pred(id) && frac(id) < TextOps.pretrainDupFracMax }
      src -> ((rows.length.toLong, kept.length.toLong,
        kept.map(_._3).sum, rows.map(_._3).sum))
    }
    val got = TextOps.pretrainCorpus(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == bySource)
    // the gate is non-degenerate: keeps some, drops some
    val (k, n) = (got.values.map(_._2).sum, got.values.map(_._1).sum)
    assert(k > 0 && k < n)
  }

  test("collocations equal a driver-side PMI replay") {
    val got = TextOps.collocations(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select(org.apache.spark.sql.functions.col("text"))
      .collect().map(_.getString(0))
    val tokLists = texts.map(_.trim.split("\\s+").toSeq)
    val pairs = tokLists.flatMap(t => t.zip(t.drop(1)))
    val uni = tokLists.flatten.groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    val nPairs = pairs.length.toLong
    val expect = pairs.groupBy(identity).map { case (p, g) => p -> g.length.toLong }
      .filter(_._2 >= TextOps.collocMinCount)
      .map { case ((a, b), nab) =>
        (s"$a $b", nab, nab * nPairs * 1000000L / (uni(a) * uni(b)))
      }.toSeq
      .sortBy { case (bg, _, s) => (-s, bg) }
      .take(TextOps.collocTopK)
    assert(got.toSeq == expect)
    // scores are non-increasing and every bigram is distinct
    assert(got.map(_._3).toSeq == got.map(_._3).sortBy(-_).toSeq)
    assert(got.map(_._1).distinct.length == got.length)
  }

  test("trained quality filter: distributed GD equals a driver-side replay and learns the heuristic") {
    val weights = TextOps.qualityLrWeights(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(weights.keySet ==
      Set("bias", "len_norm", "stopword_ratio", "ttr"))
    assert(weights.values.exists(_ != 0L), "training never moved the weights")
    val scored = TextOps.qualityLrScores(spark, sf).collect()
    // label is the top-half quality split → both classes present, and
    // the trained model must beat the majority-class baseline
    val n = scored.length
    val pos = scored.count(_.getLong(1) == 1L)
    assert(pos > 0 && pos < n)
    val acc = scored.count(r => r.getBoolean(3) == (r.getLong(1) == 1L))
      .toDouble / n
    val majority = math.max(pos, n - pos).toDouble / n
    assert(acc > majority + 0.05,
      s"model accuracy $acc not above majority baseline $majority")
    // pred is the unrounded p >= 0.5 decision; score is round(p, 6) —
    // they may only disagree within the rounding half-width
    scored.foreach { r =>
      val (score, pred) = (r.getDouble(2), r.getBoolean(3))
      if (pred) assert(score >= 0.4999995) else assert(score < 0.5000005)
    }
    // GD replay on the collected feature rows: same micro-quantized
    // arithmetic in plain Scala must land on the identical weights
    // (order-free gradient quantization ⇒ the distributed sum is exact)
    val feats = TextOps.lrTrain(spark, sf)._2.collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    var w = Array(0L, 0L, 0L, 0L)
    // per-row: Spark round() = shortest-repr BigDecimal HALF_UP;
    // driver step: exact-value BigDecimal HALF_UP (≡ DuckDB round)
    def rowMicro(v: Double): Long =
      java.math.BigDecimal.valueOf(v).setScale(0,
        java.math.RoundingMode.HALF_UP).doubleValue.toLong
    def stepMicro(v: Double): Long =
      new java.math.BigDecimal(v).setScale(0,
        java.math.RoundingMode.HALF_UP).longValueExact
    for (_ <- 1 to TextOps.lrRounds) {
      val g = Array(0L, 0L, 0L, 0L)
      feats.foreach { case (y, x1, x2, x3) =>
        val z = ((w(0).toDouble / 1e6 + w(1).toDouble / 1e6 * x1) +
          w(2).toDouble / 1e6 * x2) + w(3).toDouble / 1e6 * x3
        val p = math.max(0.0, math.min(1.0, 0.5 + z / 4.0))
        val e = p - y
        Seq(e, e * x1, e * x2, e * x3).zipWithIndex.foreach {
          case (v, j) => g(j) += rowMicro(v * 1e6)
        }
      }
      w = Array.tabulate(4)(j =>
        w(j) - stepMicro((g(j).toDouble * TextOps.lrEta) /
          feats.length.toDouble))
    }
    assert(w(0) == weights("bias") && w(1) == weights("stopword_ratio") &&
      w(2) == weights("ttr") && w(3) == weights("len_norm"))
  }
}
