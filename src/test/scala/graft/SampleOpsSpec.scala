package graft

import org.apache.spark.sql.functions._

import graft.ext.SampleOps

/** Pins the corpus-construction operators: deterministic stratified
  * sampling (data mixing) and fixed-budget sequence packing. */
class SampleOpsSpec extends SparkSuite {

  test("stratified sample is deterministic and respects per-stratum rates") {
    val spark2 = spark
    import spark2.implicits._
    val df = (0L until 4000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "stratum")
    val rates = Map("a" -> 0.5, "b" -> 0.1)
    val s1 = SampleOps.stratifiedSample(df, "stratum", "id", rates, "seed-1")
    val s2 = SampleOps.stratifiedSample(df, "stratum", "id", rates, "seed-1")
    // identical reruns — the decision is a pure hash of (seed, key)
    assert(s1.collect().toSet == s2.collect().toSet)
    val counts = s1.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 2000 rows per stratum; md5 is uniform, so observed rates sit within
    // a loose ±30% band of the target (binomial 6-sigma is far tighter)
    assert(counts("a") > 700 && counts("a") < 1300, s"a=${counts("a")}")
    assert(counts("b") > 100 && counts("b") < 300, s"b=${counts("b")}")
  }

  test("rate 0 keeps nothing, rate 1 would need threshold above ffff") {
    val spark2 = spark
    import spark2.implicits._
    val df = (0L until 200L).map(i => (i, "x")).toDF("id", "stratum")
    val none = SampleOps.stratifiedSample(df, "stratum", "id",
      Map("x" -> 0.0), "s")
    assert(none.count() == 0)
    // a stratum missing from the rate map is dropped (inner join)
    val other = SampleOps.stratifiedSample(df, "stratum", "id",
      Map("y" -> 1.0), "s")
    assert(other.count() == 0)
  }

  test("different seeds pick different subsets") {
    val spark2 = spark
    import spark2.implicits._
    val df = (0L until 1000L).map(i => (i, "x")).toDF("id", "stratum")
    val a = SampleOps.stratifiedSample(df, "stratum", "id", Map("x" -> 0.3), "s1")
      .select("id").as[Long].collect().toSet
    val b = SampleOps.stratifiedSample(df, "stratum", "id", Map("x" -> 0.3), "s2")
      .select("id").as[Long].collect().toSet
    assert(a != b)
  }

  test("packSequences offsets are contiguous per language and bins honor the budget") {
    val rows = SampleOps.packSequences(spark, sf, budget = 256)
      .collect()
      .groupBy(_.getAs[String]("lang"))
    assert(rows.nonEmpty)
    rows.foreach { case (_, docs) =>
      val sorted = docs.sortBy(_.getAs[Long]("doc_id"))
      var expectedStart = 0L
      sorted.foreach { r =>
        val start = r.getAs[Long]("start_off")
        val n = r.getAs[Long]("n_tokens")
        assert(start == expectedStart, s"gap at doc ${r.getAs[Long]("doc_id")}")
        assert(r.getAs[Long]("bin_first") == start / 256)
        assert(r.getAs[Long]("bin_last") == (start + n - 1) / 256)
        assert(r.getAs[Boolean]("straddles") ==
          (r.getAs[Long]("bin_first") != r.getAs[Long]("bin_last")))
        expectedStart = start + n
      }
    }
  }

  test("packSequences with a huge budget never straddles") {
    val rows = SampleOps.packSequences(spark, sf, budget = Int.MaxValue)
    assert(rows.filter(col("straddles")).count() == 0)
  }

  test("quota sample takes exactly min(k, |stratum|) per stratum, deterministically") {
    val docs = graft.model.Tables.documents(spark, sf)
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = 25
    val got = SampleOps.quotaByLang(spark, sf, k).collect()
    val perLang = got.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    sizes.foreach { case (lang, n) =>
      assert(perLang.getOrElse(lang, 0) == math.min(k.toLong, n),
        s"$lang: quota ${perLang.get(lang)} vs |stratum| $n")
    }
    // the sample is a subset of the corpus and reruns agree exactly
    val ids = got.map(_.getAs[Long]("doc_id")).toSet
    assert(ids.size == got.length)
    val again = SampleOps.quotaByLang(spark, sf, k).collect().map(_.toSeq).toSeq
    assert(again == got.map(_.toSeq).toSeq)
  }

  test("train/val/test split: ~80/10/10, deterministic, stable under corpus growth") {
    val spark2 = spark
    import spark2.implicits._
    val docs = graft.model.Tables.documents(spark, sf)
    val split = SampleOps.trainValTestSplit(docs, "doc_id")
    val n = docs.count().toDouble
    val frac = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05, s"train ${frac("train")}")
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.1) < 0.05, s"val $frac")
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.1) < 0.05, s"test $frac")
    // the leak-resistance property: the assignment is a pure function of
    // the key, so splitting HALF the corpus gives the same label per doc
    // as splitting all of it — incremental arrivals can't flip a split
    val full = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    val half = SampleOps.trainValTestSplit(docs.filter($"doc_id" % 2 === 0), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect()
    half.foreach { case (id, s) => assert(full(id) == s, s"doc $id flipped") }
  }

  test("leak-free split: clusters never straddle splits; doc-keyed split can leak") {
    val spark2 = spark
    import spark2.implicits._
    val lf = SampleOps.leakFreeSplit(spark, sf)
    // structural guarantee: one split per cluster_key, by construction
    val straddles = lf.groupBy("cluster_key")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(straddles == 0)
    // every document is assigned exactly once
    val nDocs = graft.model.Tables.documents(spark, sf).count()
    assert(lf.count() == nDocs)
    assert(lf.select("doc_id").distinct().count() == nDocs)
    // distribution still ≈ 80/10/10 (cluster sizes are small relative
    // to the corpus, so grouping barely moves the split masses)
    val frac = lf.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / nDocs.toDouble).toMap
    assert(math.abs(frac("train") - 0.8) < 0.07, s"train $frac")
    // the property the face exists for: among multi-doc clusters, the
    // per-DOC hash split assigns its members independently — if any such
    // cluster gets split apart under doc-keying, that is exactly the
    // train/test leak the cluster-keyed face prevents
    val clustered = lf.filter(col("cluster_key") =!= col("doc_id"))
      .select("doc_id", "cluster_key")
    if (clustered.count() > 0) {
      val docKeyed = SampleOps.trainValTestSplit(
        graft.model.Tables.documents(spark, sf), "doc_id")
      val perDoc = clustered.join(docKeyed.select("doc_id", "split"), "doc_id")
        .unionByName(
          // the keeper itself (cluster_key = doc_id rows were excluded)
          lf.select(col("cluster_key").as("doc_id"), col("cluster_key")).distinct()
            .join(clustered.select(col("cluster_key")).distinct(), Seq("cluster_key"))
            .join(docKeyed.select("doc_id", "split"), "doc_id"))
      val docKeyStraddles = perDoc.groupBy("cluster_key")
        .agg(countDistinct(col("split")).as("n")).filter(col("n") > 1).count()
      // not an invariant of the corpus, but on sf0.01+ the generator
      // plants enough dup groups that independent hashing splits some
      info(s"doc-keyed split straddles $docKeyStraddles cluster(s); cluster-keyed: 0")
    }
  }

  test("token-budget mix: equals the plain-window form, budgets bind, bigger budget extends the prefix") {
    val spark2 = spark
    import spark2.implicits._
    val mix = SampleOps.tokenBudgetMix(spark, sf)
    // definitional identity: the range-partitioned offset computation
    // must equal the naive one-window-per-source form row for row
    val naive = {
      val base = graft.model.Tables.documents(spark, sf)
        .select(col("source"), col("doc_id"),
          size(graft.ext.TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
          md5(concat(lit(SampleOps.tokenBudgetSeed + ":"),
            col("doc_id").cast("string"))).as("pri"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("pri"), col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      base.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .filter(col("cum_tokens") <= SampleOps.tokenBudgetPerSource)
        .select(col("source"), col("doc_id"), col("n_tokens"), col("cum_tokens"))
        .orderBy(col("source"), col("cum_tokens"))
    }
    assert(mix.collect().map(_.toSeq).toSeq == naive.collect().map(_.toSeq).toSeq)
    // budgets bind: every source's kept total is within budget, and the
    // next candidate (if any) would overflow it — the cut is maximal
    val kept = mix.groupBy("source").agg(max(col("cum_tokens")).as("tot"))
      .as[(String, Long)].collect().toMap
    kept.values.foreach(t => assert(t <= SampleOps.tokenBudgetPerSource))
    // prefix property: doubling the budget yields a superset whose
    // restriction to the old budget IS the old mix (stable mixes)
    val bigger = SampleOps.tokenBudgetMix(spark, sf,
        budget = SampleOps.tokenBudgetPerSource * 2)
      .filter(col("cum_tokens") <= SampleOps.tokenBudgetPerSource)
    assert(bigger.collect().map(_.toSeq).toSeq == mix.collect().map(_.toSeq).toSeq)
  }

  test("training mix: only keepers, only train, within budget, and no test twin exists") {
    val spark2 = spark
    import spark2.implicits._
    val mix = SampleOps.trainingMix(spark, sf)
    val mixIds = mix.select("doc_id").as[Long].collect().toSet
    assert(mixIds.nonEmpty)
    // no near-dup loser is in the mix
    val losers = graft.ext.DedupOps.dedupClusters(spark, sf)
      .filter(!col("is_keeper")).select("doc_id").as[Long].collect().toSet
    assert(mixIds.intersect(losers).isEmpty)
    // every mixed doc sits in the cluster-keyed train split — and
    // therefore NO member of its cluster can be in val/test (that's the
    // leak-freedom the capstone inherits by keying on the cluster)
    val split = SampleOps.leakFreeSplit(spark, sf)
    val nonTrain = split.filter(col("split") =!= "train")
      .select("doc_id").as[Long].collect().toSet
    assert(mixIds.intersect(nonTrain).isEmpty)
    val mixClusters = split.filter(col("doc_id").isin(mixIds.toSeq: _*))
      .select("cluster_key").as[Long].collect().toSet
    val leakedClusters = split
      .filter(col("cluster_key").isin(mixClusters.toSeq: _*))
      .filter(col("split") =!= "train").count()
    assert(leakedClusters == 0)
    // budgets bind
    mix.groupBy("source").agg(max(col("cum_tokens")).as("t"))
      .as[(String, Long)].collect()
      .foreach { case (_, t) => assert(t <= SampleOps.tokenBudgetPerSource) }
  }

  test("PPS sample: exactly n draws, ~proportional to weight, equals the global-window form") {
    import org.apache.spark.sql.expressions.Window
    val n = SampleOps.ppsN
    val got = SampleOps.ppsSample(spark, sf).collect()
    assert(got.map(_.getAs[Long]("hits")).sum == n.toLong)
    // multiplicity bound: a doc of weight w gets floor-counted targets,
    // at most floor(n*w/W) + 1
    val w_total = graft.model.Tables.documents(spark, sf)
      .agg(sum(col("n_chars"))).collect().head.getLong(0)
    got.foreach { r =>
      val w = r.getAs[Long]("n_chars")
      assert(r.getAs[Long]("hits") <= n * w / w_total + 1)
    }
    // the two-pass offset formulation equals the naive global window
    val naive = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("cum", sum(col("n_chars")).over(
        Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("w_total", sum(col("n_chars")).over(Window.partitionBy()))
      .withColumn("hits", expr(
        s"(${n}L * cum) DIV w_total - (${n}L * (cum - n_chars)) DIV w_total"))
      .filter(col("hits") > 0)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("cum"), col("hits"))
      .orderBy(col("doc_id")).collect()
    assert(got.map(_.toSeq).toSeq == naive.map(_.toSeq).toSeq)
  }

  test("temperature sample equals an exact JVM replay of rates and md5-60 keeps") {
    import graft.ext.SampleOps
    val docs = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang"))
    val byLang = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val isq = byLang.view.mapValues(n =>
      math.floor(math.sqrt(n.toDouble) * 1048576).toLong).toMap
    val s = isq.values.sum
    val thresh = byLang.map { case (l, n) =>
      l -> math.floor(math.min(1.0,
        (SampleOps.temperatureBudget * isq(l)).toDouble / (s * n).toDouble) *
        1152921504606846976L.toDouble).toLong
    }
    def md5_60(key: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((SampleOps.temperatureSeed + ":" + key).getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val expected = docs.filter { case (id, l) => md5_60(id.toString) < thresh(l) }
      .map(_._1).toSet
    val got = SampleOps.temperatureSample(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(got == expected, s"got ${got.size} expected ${expected.size}")
    // temperature upsamples the tail: the rarest language's RATE must
    // exceed the dominant language's (recomputed, not sampled — exact)
    val minL = byLang.minBy(_._2)._1; val maxL = byLang.maxBy(_._2)._1
    assert(thresh(minL) > thresh(maxL))
  }

  test("shard assignment: counts within one, totals preserved, balance beats naive id-mod") {
    import org.apache.spark.sql.functions._
    val shards = graft.ext.SampleOps.shardAssignment(spark, sf).collect()
    assert(shards.map(_.getLong(0)).toSeq == (0L until 8L))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .agg(count(lit(1)), sum("n_chars")).head()
    // partition of the corpus: counts and chars add up exactly
    assert(shards.map(_.getLong(1)).sum == docs.getLong(0))
    assert(shards.map(_.getLong(2)).sum == docs.getLong(1))
    // round-robin by rank: per-shard doc counts differ by at most 1
    val counts = shards.map(_.getLong(1))
    assert(counts.max - counts.min <= 1)
    // LPT balance: spread no worse than sharding by doc_id % 8
    val spread = shards.map(_.getLong(2)).max - shards.map(_.getLong(2)).min
    val naive = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy(pmod(col("doc_id"), lit(8)).as("s"))
      .agg(sum("n_chars").as("c")).collect().map(_.getLong(1))
    assert(spread <= naive.max - naive.min,
      s"LPT spread $spread vs naive ${naive.max - naive.min}")
  }

  test("passage duplication: shared counts equal a naive recompute") {
    import graft.ext.DedupOps
    val sh = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(DedupOps.shingles(col("text"), DedupOps.passageN)).as("sh"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("sh")))
    val df = sh.groupBy(_._2).view.mapValues(_.length).toMap
    val want = sh.groupBy(_._1).map { case (id, rs) =>
      id -> ((rs.length.toLong,
        rs.count(r => df(r._2) >= DedupOps.passageDfMin).toLong))
    }
    val got = DedupOps.passageDuplication(spark, sf).collect().map { r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_passages"), r.getAs[Long]("n_shared")))
    }.toMap
    assert(got == want)
    // the planted near-dup clusters guarantee some sharing exists
    assert(got.values.exists(_._2 > 0))
  }
}
