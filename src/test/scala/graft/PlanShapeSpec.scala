package graft

/** Plan-shape regression guards: the scale-critical physical-plan
  * properties audited in PLANS.md, pinned as tests so a refactor that
  * silently degrades a plan (broadcast lost, top-k unfused, a
  * correlated shape re-planned as a self-join) fails the build rather
  * than only the 100 TB deploy. */
class PlanShapeSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q5 star join broadcasts all four dimension sides") {
    val p = plan("q5_revenue_by_nation")
    // the three dims + customer broadcast by hint; at sf0.001 the tiny
    // orders side broadcasts too (AQE under threshold) — what must hold
    // at ANY scale is: ≥4 broadcast joins, ≤1 shuffle join, no loops
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4, p.take(800))
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).length <= 1)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("Q2 shape: decorrelated min joins back on the part key, dims broadcast") {
    val p = plan("q_min_cost_supplier")
    // the correlated scalar min decorrelates to one per-part aggregate
    // joined back to lineitem; part and supplier⋈nation ride broadcasts
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3, p.take(1200))
    assert(p.contains("HashAggregate"), p.take(1200))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
  }

  test("Q21 shape: chained semi then anti probe on the order key, top page fused") {
    val p = plan("q_sole_blame")
    assert(p.contains("LeftSemi"), p.take(1200))
    assert(p.contains("LeftAnti"), p.take(1200))
    // supplier dim must broadcast; the final page is a bounded top-k,
    // not a global sort
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
  }

  test("top-k queries fuse to TakeOrderedAndProject (no global sort)") {
    assert(plan("q3_top_revenue_orders").contains("TakeOrderedAndProject"))
    assert(plan("cp_oldest_ingest").contains("TakeOrderedAndProject"))
  }

  test("pushdown: pricing summary ships the shipdate predicate to the scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"))
  }

  test("correlated scalar shape plans as a window, not a self-join") {
    val p = plan("q_corr_scalar")
    assert(p.contains("Window"))
    assert(!p.contains("Join"), p.take(800))
  }

  test("semi/anti joins plan as join types, not distinct+inner rewrites") {
    assert(plan("q_semi_join").contains("LeftSemi"))
    assert(plan("q_anti_join").contains("LeftAnti"))
  }

  test("Q17 shape: one decorrelated per-part aggregate joined back, no nested loop") {
    val p = plan("q_small_qty_revenue")
    // the brand dim broadcasts into BOTH the probe side and the
    // decorrelated aggregate (each pruned before anything shuffles);
    // the join-back is the single equi-join on the part key with the
    // exact-integer 5·qty·n < sum residual
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p.take(1200))
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).length <= 1, p.take(1200))
    assert(p.contains("HashAggregate"), p.take(1200))
    assert(p.contains("In(p_brand"), "brand filter must reach the part scan")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
  }

  test("Q22 shape: scalar avg broadcasts as ONE 1-row join, anti probe date-pruned") {
    val p = plan("q_cust_sales_opp")
    // the only nested-loop is the 1-row scalar aggregate broadcast
    // (IdentityBroadcastMode); the NOT EXISTS is a LeftAnti whose build
    // side's date predicate reaches the orders scan
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length == 1, p.take(1200))
    assert(p.contains("IdentityBroadcastMode"), p.take(1200))
    assert(p.contains("LeftAnti"), p.take(1200))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "cutoff must reach the orders scan as a pushed filter")
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("Q4 shape: EXISTS is a hash semi-join carrying the date-lag residual") {
    val p = plan("q_priority_wait")
    assert(p.contains("LeftSemi"), p.take(900))
    assert(p.contains("INTERVAL '90' DAY"),
      "the cross-table lag predicate must ride the join as a residual")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(900))
  }

  test("Q15/Q20 shapes scan the fact ONCE (scalar/grain totals via window, not re-scan)") {
    Seq("q_top_supplier" -> "lineitem", "q_dominant_supplier" -> "lineitem")
      .foreach { case (q, fact) =>
        val p = plan(q)
        assert(s"$fact\\.parquet".r.findAllIn(p).length == 1,
          s"$q re-scans the fact: ${p.take(900)}")
        assert(p.contains("Window"), s"$q lost the window formulation")
        assert(!p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin"), q)
      }
    // Q15's pruned quarter must reach the scan
    assert(plan("q_top_supplier").contains("GreaterThanOrEqual(l_shipdate"),
      "quarter filter must push to the lineitem scan")
  }

  test("Q6 shape: every predicate and the projection reach the scan; no join") {
    val p = plan("q_discount_revenue")
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(l_discount,0.05)"), p.take(900))
    // the PushedFilters display string truncates, so pin the quantity
    // cap on the Filter node (data filters mirror the pushed set)
    assert("l_quantity#\\d+ < 24\\.0".r.findFirstIn(p).isDefined, p.take(900))
    assert(!p.contains("Join"), "Q6 must be a pure scan aggregate")
  }

  test("Q9/Q10/Q14 shapes: dims broadcast, at most one fact shuffle join, exact units") {
    Seq("q_profit_by_nation", "q_returned_customers", "q_promo_share")
      .foreach { q =>
        val p = plan(q)
        assert("BroadcastHashJoin".r.findAllIn(p).length >= 1, s"$q: ${p.take(900)}")
        assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).length <= 1, q)
        assert(!p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin"), q)
      }
    // Q10's page is a bounded top-k; its quarter + returnflag push down
    val q10 = plan("q_returned_customers")
    assert(q10.contains("TakeOrderedAndProject"), q10.take(900))
    assert(q10.contains("EqualTo(l_returnflag,R)") &&
      q10.contains("GreaterThanOrEqual(o_orderdate"), q10.take(900))
  }

  test("Q11/Q16 shapes: scalar/denylist thresholds via window, one fact scan each") {
    locally {
      // Q16: supplier-grain totals stay a PARTITIONED window over the
      // one fact pass
      val p = plan("q_supplier_diversity")
      assert("lineitem\\.parquet".r.findAllIn(p).length == 1,
        s"q_supplier_diversity re-scans the fact: ${p.take(900)}")
      assert(p.contains("Window"), "q_supplier_diversity lost the window formulation")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), "q_supplier_diversity")
    }
    locally {
      // Q11 (r19 optimization round): the corpus mean moved off the
      // UN-partitioned window (a single-task stage at scale) onto the
      // 1-row broadcast-scalar cross join over the CHECKPOINTED
      // parts-grain aggregate — one fact pass total (the checkpoint is
      // the only lineitem consumer; the registered plan reads the
      // materialized RDD, so the parquet path appears zero times), no
      // window, a one-row-build BNLJ by construction.
      val p = plan("q_important_parts")
      assert("lineitem\\.parquet".r.findAllIn(p).length == 0,
        s"q_important_parts re-scans the fact past its checkpoint: ${p.take(900)}")
      assert(!p.contains("Window"),
        "q_important_parts regressed to the single-task unpartitioned window")
      assert(p.contains("BroadcastNestedLoopJoin") &&
        p.contains("IdentityBroadcastMode"),
        "q_important_parts lost the 1-row broadcast-scalar mean")
      // Q11's page is a bounded top-k, not a global sort
      assert(p.contains("TakeOrderedAndProject"))
    }
  }

  test("Q19 shape: one part join, disjunction evaluated on it (no union of scans)") {
    val p = plan("q_special_revenue")
    assert("lineitem\\.parquet".r.findAllIn(p).length == 1, p.take(900))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 1, p.take(900))
    assert(p.contains("In(p_brand"), "brand superset must push to the part scan")
    assert(!p.contains("Union"), "disjunction must not plan as a union of scans")
  }

  test("Q7/Q8 shapes broadcast every dimension; at most one fact shuffle join") {
    Seq("q_volume_shipping", "q_market_share").foreach { q =>
      val p = plan(q)
      assert("BroadcastHashJoin".r.findAllIn(p).length >= 4, s"$q: ${p.take(900)}")
      assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).length <= 1, q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), q)
    }
  }

  test("knn graph runs on the native bounded-heap exec, no sort before it") {
    val p = plan("sim_knn_graph")
    assert(p.contains("TopKPerGroup"), p.take(900))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(900))
  }

  test("similarity/dedup candidate joins are equi-joins, never cross joins") {
    Seq("dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
        "sim_near_dups", "sim_lsh_topk", "sim_knn_graph").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$q has a cross join")
    }
  }

  test("global ranking plans as a range-partitioned sort, not a one-task window") {
    val p = plan("q_ntile")
    // parallel range sort over the data; the built-in global-window
    // operators (ntile over an empty partition spec) must be gone — the
    // only SinglePartition exchange left feeds the P-row offsets table
    assert(p.contains("rangepartitioning"), p.take(800))
    assert(!p.contains("ntile("), "global ntile window still in plan")
    assert(p.contains("BroadcastHashJoin"), "offsets not broadcast back")
  }

  test("single-pass funnel: one exchange on user_id, no event self-joins") {
    val p = plan("ev_funnel")
    // stacked windows over one user_id hash exchange; the per-stage
    // join-back formulation had three joins over three source scans
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p.take(800))
    assert("Scan parquet".r.findAllIn(p).length <= 1, "events scanned more than once")
  }

  test("native kernels appear in the plan (no interpreted HOF fallback in dedup paths)") {
    val p = plan("dedup_simhash")
    assert(p.contains("simhash64"))
    assert(!p.toLowerCase.contains("aggregate(zip_with"))
  }

  test("triangle closing join broadcasts the edge set (wedges stay map-side)") {
    // the registry face takes the r16 size-gated DRIVER path at every
    // test/bench SF — its "plan" is a pre-computed local relation
    // (pinned below); this test pins the DISTRIBUTED wedge pipeline
    // that runs above the driver-collect gate
    val gated = plan("q_triangles")
    assert(gated.contains("LocalTableScan") && !gated.contains("Join"),
      "gated face should be driver-computed: " + gated.take(400))
    val p = graft.operators.GraphOps
      .triangleCountGated(spark, sf, useDriverGate = false)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      p.take(800))
    // the only nested-loop joins are the final 1-row × 1-row stat
    // combiners; the wedge/closing path must stay hash-based
    assert(!p.contains("CartesianProduct"))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 2, p.take(800))
    // pair generation is the codegen'd kernel, not an interpreted HOF chain
    assert(p.contains("packed_pairs"), "PackedPairs kernel missing from plan")
  }

  test("quota sampling runs on the bounded-heap TopKPerGroup exec, no Window") {
    val p = plan("samp_quota")
    assert(p.contains("TopKPerGroup"), p.take(800))
    assert(!p.contains("Window"), "quota sample fell back to a window")
  }

  test("ewma is one window over one hash exchange, no joins") {
    val p = plan("ev_ewma")
    assert(p.contains("Window"))
    assert(!p.contains("Join"), p.take(800))
    // exactly one hashpartitioning exchange (user_id); the only other
    // exchange is the final presentation orderBy's rangepartitioning
    assert("hashpartitioning".r.findAllIn(p).length <= 2, p.take(800))
  }

  test("CMS probe joins never shuffle the sketch (broadcast or tiny-side only)") {
    val p = plan("q_cms")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // the probe set is a fused top-k, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("skyline: tiny per-size aggregate broadcast back — no quadratic join, no big sort") {
    val p = plan("q_skyline")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "skyline degenerated to a dominance self-join")
    assert(!p.contains("SortMergeJoin"), "per-size min table should broadcast")
  }

  test("hash split is a zero-shuffle narrow map before its one aggregate exchange") {
    val p = plan("samp_split")
    assert(!p.contains("Join"), p.take(800))
    // the only hash exchange is the (split, lang) aggregate's
    assert("hashpartitioning".r.findAllIn(p).length <= 1, p.take(800))
  }

  test("PPS sampling: one range partition, offsets broadcast, no global window") {
    val p = plan("samp_pps")
    assert(p.contains("rangepartitioning"), p.take(800))
    assert(p.contains("BroadcastHashJoin"), "offsets not broadcast back")
  }

  test("KMV sketch sides collapse on the bounded-heap exec before any set algebra") {
    val p = plan("q_kmv_distinct")
    assert(p.contains("TopKPerGroup"), p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("trailing-spend RANGE frame is one keyed window, no self-join expansion") {
    val p = plan("q_window_range_frame")
    assert(p.contains("Window"))
    assert(!p.contains("Join"), p.take(800))
    assert("hashpartitioning".r.findAllIn(p).length <= 1, p.take(800))
  }

  test("rolling distinct actives: bounded expand, no per-day rescan joins") {
    val p = plan("ev_rolling_distinct")
    // one semi-join against the day table; no nested-loop/self range join
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(800))
    assert("Scan parquet".r.findAllIn(p).length <= 2, "events scanned repeatedly")
  }

  test("fuzzy join verifies with the codegen'd edit kernel, not DP levenshtein") {
    val p = plan("q_fuzzy_join")
    assert(p.contains("edit_within1"), p.take(800))
    assert(!p.toLowerCase.contains("levenshtein"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("cohort retention is one user-keyed exchange, no users-to-events join") {
    val p = plan("ev_retention")
    assert(!p.contains("Join"), p.take(800))
    assert("Scan parquet".r.findAllIn(p).length == 1, "events scanned repeatedly")
  }

  test("association rules: support filter precedes the item joins") {
    val p = plan("q_assoc_rules")
    // the support-count >= minSupport filter must sit UNDER the joins
    // (candidate-sized rule table). Structural, not name-based: a
    // >=-threshold Filter appears deeper in the printed tree than the
    // first Join, and the predicate is pushed into the cached
    // pair-count scan itself (InMemoryTableScan carries it).
    val filterIdx = """Filter \(+[^\n]*>= \d""".r
      .findFirstMatchIn(p).map(_.start).getOrElse(-1)
    val joinIdx = p.indexOf("Join")
    assert(filterIdx > joinIdx && joinIdx >= 0,
      s"support filter not below the joins: filter@$filterIdx join@$joinIdx\n${p.take(1200)}")
    assert(p.linesIterator.exists(l =>
      l.contains("InMemoryTableScan") && l.contains(">=")),
      "support predicate not pushed into the cached pair-count scan")
    assert(!p.contains("CartesianProduct"))
  }

  test("interval overlap plans as a bucket equi-join, never a nested loop") {
    val p = plan("ev_interval_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(800))
    assert(p.contains("bucket"), p.take(800))
  }

  test("rfm has no single-partition exchange over the data") {
    // the registry face takes the r16 driver-ranked path at test/bench
    // SFs (pinned below); the structural pins exercise the distributed
    // withGlobalRank chain that runs above the collect gate
    val gated = plan("ev_rfm")
    assert(gated.contains("LocalTableScan") && !gated.contains("Window"),
      "gated face should be driver-ranked: " + gated.take(400))
    val p = graft.operators.EventOps
      .rfmScoresGated(spark, sf, useDriverGate = false)
      .queryExecution.executedPlan.toString
    // each quintile's range sort — and every stage before the last —
    // materializes at withGlobalRank's localCheckpoint (its determinism
    // contract), so the printed plan shows only the FINAL metric's
    // stage: a checkpointed-RDD scan joined to its P-row offset table
    // by BROADCAST. What the final plan can prove: the offsets come
    // back broadcast (never a reshuffle of the user table), and no
    // global un-partitioned ntile Window funnels the data through one
    // task (the naive plan this shape replaces)
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!"""Window \[ntile""".r.findFirstIn(p).isDefined, p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("linreg is one scan, one aggregate exchange, broadcast dimension join") {
    val p = plan("q_linreg")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert("SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).isEmpty)
    assert("Scan parquet".r.findAllIn(p).length == 2, "tables scanned repeatedly")
  }

  test("chunking is a zero-shuffle narrow map (only the presentation sort exchanges)") {
    val p = plan("text_chunks")
    // one pruned scan (doc_id + text only), no join, no aggregate, and
    // the ONLY exchange is the final orderBy's range partitioning
    assert("Exchange".r.findAllIn(p).length == 1, p.take(1000))
    assert(p.contains("Exchange rangepartitioning"), p.take(1000))
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p.take(1000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "scan not pruned to (doc_id, text)")
  }

  test("novelty runs two aggregates and one shingle-keyed join, no loops") {
    val p = plan("text_novelty")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(800))
    // the df aggregate and the per-doc rollup
    assert("HashAggregate".r.findAllIn(p).length >= 2, p.take(800))
  }

  test("ext scans fan out to full default parallelism (no fixed cap)") {
    val dp = spark.sparkContext.defaultParallelism
    // a single-file local scan plans as 1 split; FanOut must lift it to
    // AT LEAST dp — the round-9 min(dp, 16) cap would serialize a real
    // cluster's whole dedup/similarity/multimodal family into 16 tasks
    val fanned = graft.ext.FanOut(graft.model.Tables.documents(spark, sf))
    assert(fanned.rdd.getNumPartitions >= dp,
      s"fanned to ${fanned.rdd.getNumPartitions} < defaultParallelism $dp")
    // an already-wide input passes through untouched: no shuffle added
    val wide = spark.range(0, 1000, 1, dp * 4).toDF("v")
    assert(graft.ext.FanOut(wide) eq wide, "wide scan was repartitioned")
  }

  test("sim_ivf_curve: one linear plan, exactly 2 corpus scans, no union") {
    // r14's only clean-window regression: the naive 5-branch union
    // re-derived the corpus-sized IVF assignment and the brute-force
    // truth PER BRANCH (exchange reuse does not canonicalize across
    // union branches) — 20 embeddings scans. The single-plan form
    // resolves all 5 probe budgets with conditional running-rank
    // windows over ONE probe join: exactly 2 corpus scans (query side
    // + candidate side), no Union, no per-branch re-derivation.
    val p = plan("sim_ivf_curve")
    assert("embeddings\\.parquet".r.findAllIn(p).length == 2,
      "corpus re-scanned per probe budget: " + p.take(900))
    assert(!p.contains("Union"), "per-budget union reappeared: " + p.take(900))
    assert(!p.contains("CartesianProduct"), p.take(900))
  }

  test("ev_attribution: one events scan, both models from one window pass") {
    // r15's worst contention multiplier (0.41 s idle → 3.63 s under
    // driver load): the first/last-touch models left the window pass as
    // a SELF-UNION of the credited frame, and union branches do not
    // share lineage — the events scan and the per-user window exchange
    // ran twice. Both models now leave as one exploded stream: exactly
    // one events scan, no Union.
    val p = plan("ev_attribution")
    assert("events\\.parquet".r.findAllIn(p).length == 1,
      "events re-scanned per attribution model: " + p.take(900))
    assert(!p.contains("Union"), "self-union reappeared: " + p.take(900))
  }

  test("PLAN_SNAPSHOT covers the registry exactly (no drift either way)") {
    // the snapshot contract is machine-checked: every registered query
    // has a snapshot entry and no snapshot entry is stale. Keys appear
    // as "<name>": at the top level of the JSON object.
    val path = java.nio.file.Paths.get("PLAN_SNAPSHOT.json")
    assume(java.nio.file.Files.exists(path), "snapshot not in working dir")
    val body = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    // top-level keys are lines of the form `  "<name>": {...}` — the
    // per-query counter objects are written inline on one line each
    val snapKeys = "(?m)^\\s{2}\"([A-Za-z0-9_]+)\":".r
      .findAllMatchIn(body).map(_.group(1)).toSet
    val registry = SparkEntry.queries.keySet
    assert(registry.diff(snapKeys).isEmpty,
      s"registered but unsnapshotted: ${registry.diff(snapKeys)}")
    assert(snapKeys.diff(registry).isEmpty,
      s"snapshotted but unregistered: ${snapKeys.diff(registry)}")
  }
}
