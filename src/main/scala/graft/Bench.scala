package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up JVM/codegen/parquet-footer paths so the first measured
    // query doesn't absorb session startup: one tiny aggregate plus a
    // footer/page-cache touch of every table (a cold OS page cache was
    // measured to more than double an entire run)
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .limit(1000).groupBy("l_returnflag").count().collect()
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet").foreach(_ => ())
        catch { case _: Throwable => () }
      }
    } catch { case _: Throwable => () }
    // local-iteration subset (driver never sets this): comma-separated
    // query names; each runs REPEAT times (all timings printed)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    // Per-query schedule: 1 cold run + WARM warm repeats (default 2).
    // The cold number keeps the round-over-round "value" contract; the
    // warm MEDIAN is the contention-robust figure (per-query colds swing
    // 3-10x with box load, which made every regression argument cost a
    // probe run). REPEAT, when set, overrides the whole schedule (legacy
    // probe knob: run exactly REPEAT times).
    val repeatEnv = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT", "0").toInt
    val warmRepeat = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARM", "2").toInt
    val runs = if (repeatEnv > 0) repeatEnv else 1 + math.max(warmRepeat, 0)
    // validated: a non-numeric (or empty) read must not reach the JSON
    // line — an unparseable token there nulls the driver's whole parse
    def loadavg(): String =
      try {
        val src = scala.io.Source.fromFile("/proc/loadavg")
        val head = try src.mkString.split(" ").head finally src.close()
        head.toDouble // throws unless numeric
        head
      } catch { case _: Throwable => "-1" }
    val loadStart = loadavg()
    // A crashed query must never masquerade as a fast one: record -1 and
    // list it in "errs" so the JSON line distinguishes fast from broken.
    // Per-query share of the named session-cache builds (BuildTimers):
    // the memoized chains bill their one-time construction to whichever
    // query touches them FIRST, so the cold number alone can't separate
    // "this query got slower" from "this query now pays a shared build".
    // Diffing the build table around each query attributes that.
    val buildShare = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    var buildsBefore = BuildTimers.snapshot()
    val timings = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case e: Throwable =>
                   System.err.println(s"[bench] ERROR $name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
                   false }
        val sec = (System.nanoTime() - t0) / 1e9
        if (ok) sec else -1.0
      }
      val buildsAfter = BuildTimers.snapshot()
      val delta = buildsAfter.map { case (k, v) =>
        v - buildsBefore.getOrElse(k, 0.0) }.sum
      if (delta > 0.005) buildShare(name) = delta
      buildsBefore = buildsAfter
      if (runs > 1)
        System.err.println(f"[bench] $name: ${times.map(t => f"$t%.2f").mkString(" ")}")
      name -> times
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // a failure in ANY repeat marks the query errored — a warm-only
    // crash (e.g. cache corruption) must not hide behind a clean
    // cold timing
    val results = timings.map { case (name, times) =>
      name -> (if (times.exists(_ < 0)) -1.0 else times.head)
    }
    val warmMed = timings.collect { case (name, times)
      if !times.exists(_ < 0) && times.size > 1 => name -> median(times.tail)
    }
    val errNames = results.collect { case (n, t) if t < 0 => n }.toSeq.sorted
    val nOk = results.count(_._2 >= 0)
    // The driver records only the last 2000 chars of output (plus sbt's
    // trailing [success] line), and a line whose head falls outside that
    // window is recorded unparsed. Strip trailing zeros ("0.30"->"0.3",
    // "2.00"->"2") and drop to 1 decimal if the registry ever grows the
    // line past ~1850 chars.
    def fmt(v: Double, dec: Int): String = {
      val s = String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(v))
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
      else s
    }
    val loadEnd = loadavg()
    // Evidence-hygiene rule (rounds 9-11), now structural: per-query
    // timings recorded on a loaded box are not comparable round-over-
    // round (colds swing 3-10x under contention), so the artifact
    // certifies its own window. load_start above the threshold marks
    // the WHOLE artifact contaminated; regression arguments must cite
    // an uncontaminated run.
    val idleMax =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_IDLE_MAX", "1.5").toDouble
    val contaminated =
      try loadStart.toDouble > idleMax catch { case _: Throwable => true }
    val contamField =
      if (contaminated) s""","contaminated":true,"idle_max":$idleMax"""
      else ""
    if (contaminated)
      System.err.println(
        s"[bench] WARNING: load_start $loadStart > $idleMax — artifact marked contaminated")
    def line(dec: Int, keep: Int): String = {
      val slowestFirst = results.toSeq.sortBy(-_._2)
      val kept = slowestFirst.take(keep)
      val omitted = results.size - kept.size
      val omittedSum = slowestFirst.drop(keep).map(_._2).filter(_ >= 0).sum
      val qs = kept.map { case (k, v) =>
        "\"" + k + "\":" + (if (v < 0) "-1" else fmt(v, dec))
      }.mkString("{", ",", "}")
      // total = sum of SUCCESSFUL query times only (n_ok/n_err say how
      // many that is — totals over unequal query sets must not be
      // naively compared, so the counts ride in the line itself).
      val total = results.values.filter(_ >= 0).sum
      val wTotal = if (warmMed.nonEmpty)
        s""","warm_total":${fmt(warmMed.values.sum, dec)}"""
      else ""
      val omit = if (omitted > 0)
        s""","omitted_queries":$omitted,"omitted_sec":${fmt(omittedSum, dec)}"""
      else ""
      val errs = if (errNames.nonEmpty)
        s""","errs":${errNames.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
      else ""
      val load = s""","load_start":$loadStart,"load_end":$loadEnd$contamField"""
      s"""{"metric":"total","value":${fmt(total, dec)},"unit":"sec","n_ok":$nOk,"n_err":${errNames.size}$wTotal,"queries":$qs$errs$load$omit,"sf":"$sfDir"}"""
    }
    // Full per-query detail (cold + warm median) goes to a repo-local
    // file — the 2000-char driver window can't carry 138 pairs, but
    // STATUS/regression arguments can cite this file directly.
    try {
      val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
        "BENCH_DETAIL.json")
      val detail = results.toSeq.sortBy(-_._2).map { case (k, v) =>
        val w = warmMed.get(k).map(m => s""","warm_med":${fmt(m, 2)}""").getOrElse("")
        val b = buildShare.get(k).map(s => s""","build_sec":${fmt(s, 2)}""").getOrElse("")
        s""""$k":{"cold":${if (v < 0) "-1" else fmt(v, 2)}$w$b}"""
      }.mkString("{", ",", "}")
      val builds = BuildTimers.snapshot().toSeq.sortBy(-_._2)
        .map { case (k, v) => s""""$k":${fmt(v, 2)}""" }.mkString("{", ",", "}")
      val body = s"""{"sf":"$sfDir","runs":$runs,"n_ok":$nOk,"n_err":${errNames.size},"load_start":$loadStart,"load_end":$loadEnd$contamField,"builds":$builds,"queries":$detail}"""
      java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
        body.getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] detail write failed: ${e.getMessage}")
    }
    // window budget: 2000 chars minus sbt's ~75-char [success] tail.
    // Degrade precision first; past the registry size where even
    // 0-decimal full detail can't fit (a truncated HEAD is unparseable
    // JSON — the whole round's bench would record as null), keep only
    // the slowest queries and summarize the shed tail, halving until
    // the line fits. The total is always exact and complete.
    val candidates =
      Seq(2, 1, 0).map(line(_, results.size)) ++
        (results.size - 1 to 0 by -5).map(line(0, _))
    val out = candidates.find(_.length <= 1915).getOrElse(line(0, 0))
    println(out)
    graft.ext.DedupOps.releaseShared()
    spark.stop()
  }
}
