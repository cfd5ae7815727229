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
}
