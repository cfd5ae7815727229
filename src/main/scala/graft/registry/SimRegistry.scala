package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{DedupOps, MultimodalOps, SampleOps, SimilarityOps, TextOps}
import graft.model.{Fixtures, Tables}
import graft.operators.{ChangeOps, EventOps, KubeOps, ListingOps, Relational, TimeOps}

/** similarity / ANN [EXT] slice of the driver registry — split from the
  * monolithic SparkEntry (r14 judge #7). PURE move: faces, oracle SQL,
  * and registry entries are verbatim; SparkEntry composes the family
  * maps and RegistryOrderSpec pins that the composed registry's key
  * set AND iteration order are identical to the pre-split literal
  * (REGISTRY_ORDER.txt). */
private[graft] object SimRegistry {

  private def sqlStr(s: String): String = CpFaces.sqlStr(s)


  private[graft] val simBruteForceSql: String =
    """WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 5),
      |sims AS (SELECT qid, vec_id, round(
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(qvec[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(qvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))), 6) AS cos
      |  FROM q, c),
      |ranked AS (SELECT qid, vec_id, cos,
      |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
      |  FROM sims)
      |SELECT qid, rnk AS "rank", vec_id, cos FROM ranked WHERE rnk <= 5
      |ORDER BY qid, rnk""".stripMargin


  /** Brute force over the bounded `vec_id < 256` slice — the comparison
    * surface of the capped lossless-PQ endpoint (see SimilarityOps
    * .pqExact). */
  private[graft] val simBruteForceCappedSql: String =
    simBruteForceSql.replace("WHERE vec_id >= 5",
      "WHERE vec_id >= 5 AND vec_id < 256")


  /** In-order cosine over `d` dims — the numeric contract shared by the
    * CosineSimilarity/TopCentroidIds kernels: separate in-order folds
    * for the dot and both squared norms, then dot/(sqrt·sqrt). */
  private[graft] def cosSql(a: String, b: String, d: Int = 64): String = {
    def fold(x: String, y: String) =
      s"list_sum(list_transform(range(1, ${d + 1}), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"
    s"${fold(a, b)} / (sqrt(${fold(a, a)}) * sqrt(${fold(b, b)}))"
  }


  /** Replay of SimilarityOps.dimCurve: per-dim brute-force rankings
    * (cosSql over the first d components ≡ the Spark slice) joined
    * against the full-dimension ranking. */
  private[graft] val simDimCurveSql: String = {
    val (nq, k) = (5, 5)
    val denom = (nq * k).toDouble
    def rankedCte(d: Int): String =
      s"""ranked$d AS MATERIALIZED (
         |  SELECT qid, vec_id FROM (
         |    SELECT qid, c.vec_id,
         |      row_number() OVER (PARTITION BY qid
         |        ORDER BY round(${cosSql("qvec", "c.embedding", d)}, 6) DESC,
         |        c.vec_id ASC) AS rnk
         |    FROM q, c) r
         |  WHERE rnk <= $k)""".stripMargin
    val ctes = SimilarityOps.dimCurveDims.map(rankedCte).mkString(",\n")
    val rows = SimilarityOps.dimCurveDims.map { d =>
      s"""SELECT CAST($d AS BIGINT) AS dim,
         |  CAST(count(*) AS BIGINT) AS n_hits,
         |  CAST(count(*) AS DOUBLE) / $denom AS recall
         |FROM ranked$d t$d JOIN ranked64 f$d USING (qid, vec_id)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec
       |           FROM embeddings WHERE vec_id < $nq),
       |c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= $nq),
       |$ctes
       |SELECT * FROM (
       |$rows) u
       |ORDER BY dim""".stripMargin
  }


  /** Replay of SimilarityOps.mmrSelect: the same top-C relevance pool,
    * the same C×C round-6 pairwise cosines, and the greedy chain
    * unrolled into k step CTEs — each step's argmax is the identical
    * (mmr DESC, vec_id) total order. */
  private[graft] val simMmrSql: String = {
    val lam = SimilarityOps.mmrLambda
    val mu = SimilarityOps.mmrMu
    val c = SimilarityOps.mmrPoolSize
    val k = SimilarityOps.mmrK
    def prevUnion(n: Int): String =
      (1 until n).map(j => s"SELECT vec_id FROM s$j").mkString(" UNION ALL ")
    // every step CTE is MATERIALIZED: s_n references s_1..s_{n-1}, so an
    // inlining planner would re-expand the chain exponentially
    val steps = (2 to k).map { n =>
      s"""m$n AS MATERIALIZED (SELECT c.vec_id, c.rel, max(p.cos) AS ms
         |  FROM pool c JOIN psim p ON p.a = c.vec_id
         |  WHERE p.b IN (${prevUnion(n)})
         |    AND c.vec_id NOT IN (${prevUnion(n)})
         |  GROUP BY c.vec_id, c.rel),
         |s$n AS MATERIALIZED (SELECT vec_id, rel, ms,
         |  ($lam * rel - $mu * ms) AS mmr
         |  FROM m$n ORDER BY mmr DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (1 to k).map(n =>
      s"""SELECT CAST($n AS BIGINT) AS "rank", vec_id, rel, ms AS max_sim, mmr FROM s$n""")
      .mkString("\n  UNION ALL ")
    s"""WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
       |pool AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |    round(${cosSql("qvec", "embedding")}, 6) AS rel
       |  FROM embeddings, q WHERE vec_id > 0
       |  ORDER BY rel DESC, vec_id ASC LIMIT $c),
       |psim AS MATERIALIZED (
       |  SELECT p1.vec_id AS a, p2.vec_id AS b,
       |    round(${cosSql("p1.embedding", "p2.embedding")}, 6) AS cos
       |  FROM pool p1, pool p2 WHERE p1.vec_id <> p2.vec_id),
       |s1 AS MATERIALIZED (SELECT vec_id, rel, 0.0 AS ms,
       |  ($lam * rel - $mu * 0.0) AS mmr
       |  FROM pool ORDER BY mmr DESC, vec_id LIMIT 1),
       |$steps
       |$out
       |ORDER BY "rank"""".stripMargin
  }

  /** Full replay of the TRAINED IVF face (SimilarityOps.ivfTopK):
    * 2 unrolled Lloyd's rounds — assignment by in-order cosine argmax
    * (ties to the lowest cid, exactly the TopCentroidIds contract) and
    * cluster means in 2⁻²⁰ fixed point with truncating integer division
    * (DuckDB `//` ≡ Scala `Long./` toward zero; empty clusters keep
    * their previous centroid) — then corpus assignment, 4-probe
    * selection, and candidate ranking. Deterministic training is what
    * makes an approximate TRAINED index hash-checkable at all. */
  // CTE-only form (the simLshChainCtes pattern) so sim_ivf_eval can
  // graft the brute-force truth and the hit join onto the same chain
  private lazy val simIvfChainCtes: String = {
    val rounds = (1 to 2).map { r =>
      s"""s$r AS (SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cv")} AS cs
         |  FROM e CROSS JOIN c${r - 1} c),
         |a$r AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rn
         |  FROM s$r) z WHERE rn = 1),
         |x$r AS (SELECT a.cid, t.i,
         |    sum(CAST(floor(CAST(e.embedding[t.i] AS DOUBLE) * 1048576) AS BIGINT)) AS s,
         |    count(*) AS n
         |  FROM e JOIN a$r a USING (vec_id) CROSS JOIN range(1, 65) t(i)
         |  GROUP BY a.cid, t.i),
         |c$r AS (SELECT cid, list(CAST(CAST(CAST(s AS BIGINT) // n AS DOUBLE) / 1048576 AS REAL) ORDER BY i) AS cv
         |    FROM x$r GROUP BY cid
         |  UNION ALL SELECT c.cid, c.cv FROM c${r - 1} c
         |    WHERE NOT EXISTS (SELECT 1 FROM x$r x WHERE x.cid = c.cid))""".stripMargin
    }.mkString(",\n")
    s"""e AS (SELECT vec_id, embedding FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, embedding AS cv FROM e WHERE vec_id < 16),
       |$rounds,
       |fs AS (SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cv")} AS cs
       |  FROM e CROSS JOIN c2 c),
       |corp AS (SELECT vec_id, cid FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rn
       |  FROM fs WHERE vec_id >= 5) z WHERE rn = 1)""".stripMargin
  }


  /** The probe/rank tail of the IVF chain at probe budget `p`, CTE
    * names suffixed so several budgets can coexist in one statement. */
  private[graft] def simIvfRankedCtes(p: Int, sfx: String): String =
    s"""prb$sfx AS (SELECT vec_id AS qid, cid FROM (SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rn
       |  FROM fs WHERE vec_id < 5) z WHERE rn <= $p),
       |sims$sfx AS (SELECT p.qid, a.vec_id,
       |    round(${cosSql("q.embedding", "v.embedding")}, 6) AS cos
       |  FROM prb$sfx p JOIN corp a ON p.cid = a.cid
       |  JOIN e q ON q.vec_id = p.qid JOIN e v ON v.vec_id = a.vec_id),
       |ranked$sfx AS (SELECT qid, vec_id, cos,
       |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
       |  FROM sims$sfx)""".stripMargin

  private lazy val simIvfTopKSql: String =
    s"""WITH $simIvfChainCtes,
       |${simIvfRankedCtes(4, "")}
       |SELECT qid, rnk AS "rank", vec_id, cos FROM ranked WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin

  /** Replay of SimilarityOps.ivfEval: the trained-IVF chain at the
    * default 4-probe budget, the brute-force truth, and the per-query
    * hit count in one statement (same graft as simAnnEvalSql). */
  private lazy val simIvfEvalSql: String =
    s"""WITH $simIvfChainCtes,
       |${simIvfRankedCtes(4, "")},
       |${recallGraftSql("e")}""".stripMargin

  /** Replay of SimilarityOps.ivfCurve: ONE trained chain, the ranked
    * tail instantiated per probe budget, one shared brute-force truth,
    * per-(budget, query) recall unioned. */
  private lazy val simIvfCurveSql: String = {
    val probes = Seq(1, 2, 4, 8, 16)
    val tails = probes.map(p => simIvfRankedCtes(p, s"_$p")).mkString(",\n")
    val recs = probes.map { p =>
      s"""atop_$p AS (SELECT qid, vec_id FROM ranked_$p WHERE rnk <= 5),
         |hits_$p AS (SELECT a.qid, CAST(count(*) AS BIGINT) AS n_hit
         |  FROM atop_$p a JOIN btop b ON a.qid = b.qid AND a.vec_id = b.vec_id
         |  GROUP BY a.qid),
         |rec_$p AS (SELECT CAST($p AS BIGINT) AS n_probe, qs.qid,
         |  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         |  (CAST(coalesce(h.n_hit, 0) AS BIGINT) * 1000000) // 5 AS recall_micro
         |  FROM qs LEFT JOIN hits_$p h ON h.qid = qs.qid)""".stripMargin
    }.mkString(",\n")
    val union = probes.map(p => s"SELECT * FROM rec_$p").mkString("\n  UNION ALL ")
    s"""WITH $simIvfChainCtes,
       |$tails,
       |bq AS (SELECT vec_id AS qid, embedding AS qvec FROM e WHERE vec_id < 5),
       |bc AS (SELECT vec_id, embedding FROM e WHERE vec_id >= 5),
       |bsims AS (SELECT qid, bc.vec_id,
       |    round(${cosSql("qvec", "bc.embedding")}, 6) AS cos
       |  FROM bq, bc),
       |branked AS (SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
       |  FROM bsims),
       |btop AS (SELECT qid, vec_id FROM branked WHERE rnk <= 5),
       |qs AS (SELECT DISTINCT qid FROM btop),
       |$recs
       |SELECT * FROM ($union) u
       |ORDER BY n_probe, qid""".stripMargin
  }

  /** Full replay of the TRAINED PQ face (SimilarityOps.pqTopK): per
    * subspace (m=8, dsub=8, ksub=64), 2 unrolled Lloyd's rounds with
    * the same cosine-argmax assignment + fixed-point means as the IVF
    * oracle, then encode (per-subspace nearest code), reconstruct
    * (codebook concat in subspace order), ADC-score every candidate,
    * keep the rerank·k = 100 ADC survivors per query and re-rank them
    * with TRUE cosines (the standard ADC + exact-re-rank pipeline the
    * Spark face runs). */
  // CTE-only form (the simLshChainCtes pattern) so sim_pq_eval can
  // graft the brute-force truth and the hit join onto the same chain
  private lazy val simPqChainCtes: String = {
    val rounds = (1 to 2).map { r =>
      s"""p$r AS (SELECT s.vec_id, s.si, k.cid, ${cosSql("s.sv", "k.cv", 8)} AS cs
         |  FROM sub s JOIN k${r - 1} k ON s.si = k.si),
         |b$r AS (SELECT vec_id, si, cid FROM (SELECT vec_id, si, cid,
         |    row_number() OVER (PARTITION BY vec_id, si ORDER BY cs DESC, cid ASC) AS rn
         |  FROM p$r) z WHERE rn = 1),
         |y$r AS (SELECT b.si, b.cid, t.j,
         |    sum(CAST(floor(CAST(s.sv[t.j] AS DOUBLE) * 1048576) AS BIGINT)) AS s,
         |    count(*) AS n
         |  FROM sub s JOIN b$r b USING (vec_id, si) CROSS JOIN range(1, 9) t(j)
         |  GROUP BY b.si, b.cid, t.j),
         |k$r AS (SELECT si, cid, list(CAST(CAST(CAST(s AS BIGINT) // n AS DOUBLE) / 1048576 AS REAL) ORDER BY j) AS cv
         |    FROM y$r GROUP BY si, cid
         |  UNION ALL SELECT k.si, k.cid, k.cv FROM k${r - 1} k
         |    WHERE NOT EXISTS (SELECT 1 FROM y$r y WHERE y.si = k.si AND y.cid = k.cid))""".stripMargin
    }.mkString(",\n")
    s"""e AS (SELECT vec_id, embedding FROM embeddings),
       |sub AS (SELECT vec_id, t.si,
       |    list_transform(range(1, 9), j -> embedding[t.si * 8 + j]) AS sv
       |  FROM e CROSS JOIN range(0, 8) t(si)),
       |k0 AS (SELECT vec_id AS cid, si, sv AS cv FROM sub WHERE vec_id < 64),
       |$rounds,
       |pe AS (SELECT s.vec_id, s.si, k.cid, ${cosSql("s.sv", "k.cv", 8)} AS cs
       |  FROM sub s JOIN k2 k ON s.si = k.si WHERE s.vec_id >= 5),
       |enc AS (SELECT vec_id, si, cid FROM (SELECT vec_id, si, cid,
       |    row_number() OVER (PARTITION BY vec_id, si ORDER BY cs DESC, cid ASC) AS rn
       |  FROM pe) z WHERE rn = 1),
       |rec AS (SELECT n.vec_id, flatten(list(k.cv ORDER BY n.si)) AS rv
       |  FROM enc n JOIN k2 k ON k.si = n.si AND k.cid = n.cid
       |  GROUP BY n.vec_id),
       |adc AS (SELECT q.vec_id AS qid, r.vec_id,
       |    round(${cosSql("q.embedding", "r.rv")}, 6) AS adc
       |  FROM e q CROSS JOIN rec r WHERE q.vec_id < 5),
       |cnd AS (SELECT qid, vec_id FROM (SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY adc DESC, vec_id ASC) AS crn
       |  FROM adc) z WHERE crn <= 100),
       |sims AS (SELECT c.qid, c.vec_id,
       |    round(${cosSql("q.embedding", "v.embedding")}, 6) AS cos
       |  FROM cnd c JOIN e q ON q.vec_id = c.qid JOIN e v ON v.vec_id = c.vec_id),
       |ranked AS (SELECT qid, vec_id, cos,
       |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
       |  FROM sims)""".stripMargin
  }

  private lazy val simPqTopKSql: String =
    s"""WITH $simPqChainCtes
       |SELECT qid, rnk AS "rank", vec_id, cos FROM ranked WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin

  /** Replay of SimilarityOps.pqEval: the trained-PQ chain, the
    * brute-force truth, and the per-query hit count in one statement
    * (same graft as simAnnEvalSql). */
  private lazy val simPqEvalSql: String =
    s"""WITH $simPqChainCtes,
      |${recallGraftSql("e")}""".stripMargin


  /** The hyperplane matrix as a DuckDB nested-list literal — the
    * rpMatrixSql discipline: splitmix64-mixed components are computed
    * ONCE in Scala (SimilarityOps.planeComponent) and interpolated as
    * doubles (`Double.toString` round-trips exactly), so the oracle
    * holds bit-identical planes with no in-SQL generator replay. */
  private[graft] def lshPlaneMatrixSql(nPlanesTotal: Int): String =
    (0 until nPlanesTotal).map { p =>
      (0 until 64).map(j =>
        graft.ext.SimilarityOps.planeComponent(p, j).toString)
        .mkString("[", ", ", "]")
    }.mkString("[", ", ", "]")

  /** Full replication of the multi-table hyperplane-LSH near-dup join:
    * the planes are interpolated literals (lshPlaneMatrixSql), the
    * plane dots are in-order double folds (bit-identical to
    * list_sum(list_transform(...)) — the same contract the green
    * brute-force oracle relies on), so bucket membership, the candidate
    * set, and the verified cosines all reproduce exactly. */
  // Shared CTE chain for the embedding near-dup faces: LCG hyperplane
  // buckets per table, candidate equi-join, exact cosine verify.
  // Declared RECURSIVE so the cluster face can append the reachability
  // walk; the pair face simply doesn't use the recursion.
  private lazy val simNearDupCtes: String =
    s"""WITH RECURSIVE emb AS (SELECT vec_id, embedding FROM embeddings),
      |pm AS (SELECT ${lshPlaneMatrixSql(12)} AS m),
      |tp AS (SELECT t, p FROM generate_series(0, 1) g1(t)
      |       CROSS JOIN generate_series(0, 5) g2(p)),
      |dots AS (SELECT e.vec_id, tp.t, tp.p,
      |    list_sum(list_transform(range(1, 65),
      |      j -> CAST(e.embedding[j] AS DOUBLE) * pm.m[tp.t * 6 + tp.p + 1][j])) AS d
      |  FROM emb e CROSS JOIN tp, pm),
      |buck AS (SELECT vec_id, t,
      |    CAST(sum(CASE WHEN d > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
      |  FROM dots GROUP BY vec_id, t),
      |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      |  FROM buck a JOIN buck b
      |    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
      |v AS (SELECT vec_a, vec_b, round(
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(ea.embedding[i] AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(eb.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE))))), 6) AS cos
      |  FROM cand JOIN emb ea ON ea.vec_id = vec_a
      |            JOIN emb eb ON eb.vec_id = vec_b)""".stripMargin


  private[graft] val simNearDupsSql: String =
    s"""$simNearDupCtes
      |SELECT vec_a, vec_b, cos FROM v WHERE cos >= 0.3
      |ORDER BY vec_a, vec_b""".stripMargin

  // sim_knn_graph: both directions of every verified bucket-collision
  // pair, top-3 per vector by (cos DESC, nbr ASC) — the same chain, no
  // threshold, ranked instead of filtered.
  private lazy val simKnnGraphSql: String =
    s"""$simNearDupCtes,
      |sym AS (SELECT vec_a AS vec_id, vec_b AS nbr_id, cos FROM v
      |        UNION ALL SELECT vec_b, vec_a, cos FROM v),
      |rk AS (SELECT vec_id, nbr_id, cos,
      |    row_number() OVER (PARTITION BY vec_id
      |                       ORDER BY cos DESC, nbr_id ASC) AS "rank"
      |  FROM sym)
      |SELECT vec_id, "rank", nbr_id, cos FROM rk WHERE "rank" <= 3
      |ORDER BY vec_id, "rank"""".stripMargin

  // sim_decontaminate: same LCG buckets, but candidates are
  // train(label != 0) x holdout(label = 0) bucket collisions; exact
  // cosine verify, per-train-vector match count, flag.
  private lazy val simDecontaminateSql: String =
    s"""WITH emb AS (SELECT vec_id, label, embedding FROM embeddings),
      |pm AS (SELECT ${lshPlaneMatrixSql(12)} AS m),
      |tp AS (SELECT t, p FROM generate_series(0, 1) g1(t)
      |       CROSS JOIN generate_series(0, 5) g2(p)),
      |dots AS (SELECT e.vec_id, tp.t, tp.p,
      |    list_sum(list_transform(range(1, 65),
      |      j -> CAST(e.embedding[j] AS DOUBLE) * pm.m[tp.t * 6 + tp.p + 1][j])) AS d
      |  FROM emb e CROSS JOIN tp, pm),
      |buck AS (SELECT vec_id, t,
      |    CAST(sum(CASE WHEN d > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
      |  FROM dots GROUP BY vec_id, t),
      |cand AS (SELECT DISTINCT a.vec_id AS vec_id, b.vec_id AS eval_id
      |  FROM buck a JOIN emb ta ON ta.vec_id = a.vec_id AND ta.label <> 0
      |       JOIN buck b ON a.t = b.t AND a.bucket = b.bucket
      |       JOIN emb tb ON tb.vec_id = b.vec_id AND tb.label = 0),
      |hits AS (SELECT cand.vec_id AS vec_id, CAST(count(*) AS BIGINT) AS n_matches
      |  FROM cand
      |  JOIN emb ea ON ea.vec_id = cand.vec_id
      |  JOIN emb eb ON eb.vec_id = cand.eval_id
      |  WHERE round(
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(ea.embedding[i] AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(eb.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE))))), 6)
      |    >= 0.3
      |  GROUP BY cand.vec_id)
      |SELECT e.vec_id, coalesce(h.n_matches, 0) AS n_matches,
      |       coalesce(h.n_matches, 0) > 0 AS contaminated
      |FROM emb e LEFT JOIN hits h ON h.vec_id = e.vec_id
      |WHERE e.label <> 0
      |ORDER BY e.vec_id""".stripMargin


  // sim_clusters: connected components over the verified near-dup pair
  // set — same recursive min-label reachability walk as dedup_clusters.
  private[graft] val simClustersSql: String =
    s"""$simNearDupCtes,
      |p AS (SELECT vec_a, vec_b FROM v WHERE cos >= 0.3),
      |edges AS (SELECT vec_a AS u, vec_b AS w FROM p
      |          UNION ALL SELECT vec_b, vec_a FROM p),
      |walk(u, label) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      |  UNION
      |  SELECT e.u, w2.label FROM edges e JOIN walk w2 ON e.w = w2.u
      |)
      |SELECT u AS vec_id, min(label) AS cluster,
      |       (u = min(label)) AS is_keeper
      |FROM walk GROUP BY u ORDER BY vec_id""".stripMargin


  // sim_semantic_keeper: the semantic-cluster walk (same chain as
  // sim_clusters) LEFT-joined onto the full quality-scored corpus —
  // singletons cluster to themselves; keeper = (quality DESC, doc_id
  // ASC) argmax per cluster, emitted as a per-document kept verdict.
  private[graft] val simSemanticKeeperSql: String =
    s"""$simNearDupCtes,
      |p AS (SELECT vec_a, vec_b FROM v WHERE cos >= 0.3),
      |edges AS (SELECT vec_a AS u, vec_b AS w FROM p
      |          UNION ALL SELECT vec_b, vec_a FROM p),
      |walk(u, label) AS (
      |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      |  UNION
      |  SELECT e.u, w2.label FROM edges e JOIN walk w2 ON e.w = w2.u
      |),
      |cl AS (SELECT u AS doc_id, min(label) AS cluster FROM walk GROUP BY u),
      |toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
      |         FROM documents),
      |qx AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS nt,
      |        CAST(len(list_distinct(t)) AS DOUBLE) AS nd,
      |        CAST(len(list_filter(t, y -> y IN ${TextRegistry.stopSet})) AS DOUBLE) AS ns
      |      FROM toks),
      |q AS (SELECT doc_id,
      |        round(least(nt / 100.0, 1.0) * 0.4 + (nd / nt) * 0.4
      |              + (ns / nt) * 0.2, 6) AS quality
      |      FROM qx),
      |allx AS (SELECT q.doc_id, coalesce(cl.cluster, q.doc_id) AS cluster,
      |           q.quality
      |         FROM q LEFT JOIN cl USING (doc_id)),
      |rk AS (SELECT doc_id, cluster, quality,
      |         row_number() OVER (PARTITION BY cluster
      |                            ORDER BY quality DESC, doc_id ASC) AS rn
      |       FROM allx)
      |SELECT doc_id, cluster, quality, (rn = 1) AS kept
      |FROM rk ORDER BY doc_id""".stripMargin

  /** Replication of the query-directed multi-probe LSH top-k: 5 tables
    * × 9-plane buckets (interpolated splitmix64 planes, global plane
    * index t·9+p; 512 buckets/table sizes the corpus/bucket ratio for
    * recall at the test SFs); per (query, table) the candidate subsets
    * flip the 6 planes with smallest |dot| (ties by in-table plane
    * index — the same (|d|, p) struct sort the Spark side runs), and
    * the probe SEQUENCE ranks subsets by Σd² (ties by subset id — the
    * Spark side's (s, g, m) struct sort) and keeps the first 64 — the
    * full lattice at the measured recall knee for this corpus — so the
    * probed bucket SET is identical by construction. Candidates on
    * (table, bucket) equality, exact cosine ranking with the
    * (cos DESC, vec_id ASC) tie-break both engines share. */
  // CTE-only form so sim_ann_eval can graft the brute-force truth and
  // the hit join onto the same chain (the spanChainCtes pattern)
  private lazy val simLshChainCtes: String =
    s"""emb AS (SELECT vec_id, embedding FROM embeddings),
      |pm AS (SELECT ${lshPlaneMatrixSql(45)} AS m),
      |pl AS (SELECT p FROM generate_series(0, 44) g(p)),
      |dots AS (SELECT e.vec_id, pl.p,
      |    list_sum(list_transform(range(1, 65),
      |      j -> CAST(e.embedding[j] AS DOUBLE) * pm.m[pl.p + 1][j])) AS d
      |  FROM emb e CROSS JOIN pl, pm),
      |buck AS (SELECT vec_id, p // 9 AS tbl,
      |    CAST(sum(CASE WHEN d > 0 THEN 1 << (p % 9) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM dots GROUP BY vec_id, p // 9),
      |qd AS (SELECT vec_id, p // 9 AS tbl, p % 9 AS lp, d,
      |    row_number() OVER (PARTITION BY vec_id, p // 9
      |                       ORDER BY abs(d), p % 9) AS rn
      |  FROM dots WHERE vec_id < 5),
      |lowp AS (SELECT vec_id, tbl, list(lp ORDER BY rn) AS lps,
      |    list(d ORDER BY rn) AS ds
      |  FROM qd WHERE rn <= 6 GROUP BY vec_id, tbl),
      |gg AS (SELECT g FROM generate_series(0, 63) t(g)),
      |gsc AS (SELECT l.vec_id, l.tbl, gg.g,
      |    list_sum(list_transform(range(1, 7),
      |      i -> CASE WHEN (gg.g >> (i - 1)) & 1 = 1
      |                THEN l.ds[i] * l.ds[i] ELSE 0.0 END)) AS s,
      |    CAST(list_sum(list_transform(range(1, 7),
      |      i -> CASE WHEN (gg.g >> (i - 1)) & 1 = 1
      |                THEN 1 << l.lps[i] ELSE 0 END)) AS BIGINT) AS m
      |  FROM lowp l CROSS JOIN gg),
      |gsel AS (SELECT vec_id, tbl, m,
      |    row_number() OVER (PARTITION BY vec_id, tbl ORDER BY s, g) AS srn
      |  FROM gsc),
      |probes AS (SELECT q.vec_id AS qid, q.tbl, xor(q.bucket, g2.m) AS bucket
      |  FROM buck q JOIN gsel g2 ON g2.vec_id = q.vec_id AND g2.tbl = q.tbl
      |  WHERE q.vec_id < 5 AND g2.srn <= 64),
      |cand AS (SELECT DISTINCT p.qid, c.vec_id
      |  FROM probes p JOIN buck c ON p.tbl = c.tbl AND p.bucket = c.bucket
      |  WHERE c.vec_id >= 5),
      |sims AS (SELECT qid, cand.vec_id, round(
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(eq.embedding[i] AS DOUBLE) * CAST(ec.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(eq.embedding[i] AS DOUBLE) * CAST(eq.embedding[i] AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(ec.embedding[i] AS DOUBLE) * CAST(ec.embedding[i] AS DOUBLE))))), 6) AS cos
      |  FROM cand JOIN emb eq ON eq.vec_id = cand.qid
      |            JOIN emb ec ON ec.vec_id = cand.vec_id),
      |ranked AS (SELECT qid, vec_id, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
      |  FROM sims)""".stripMargin


  private[graft] val simLshTopKSql: String =
    s"""WITH $simLshChainCtes
      |SELECT qid, rnk AS "rank", vec_id, cos FROM ranked WHERE rnk <= 5
      |ORDER BY qid, rnk""".stripMargin


  /** Shared truth-graft block for the ANN eval oracles: brute-force
    * cosine truth over `embCte` (any CTE/table with vec_id +
    * embedding), hits against the chain's `ranked` top-5, per-query
    * recall in micros — ONE definition so the truth cosine and the
    * recall formula can never desynchronize across the eval family. */
  private[graft] def recallGraftSql(embCte: String): String =
    s"""atop AS (SELECT qid, vec_id FROM ranked WHERE rnk <= 5),
      |bq AS (SELECT vec_id AS qid, embedding AS qvec FROM $embCte WHERE vec_id < 5),
      |bc AS (SELECT vec_id, embedding FROM $embCte WHERE vec_id >= 5),
      |bsims AS (SELECT qid, bc.vec_id, round(
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(qvec[i] AS DOUBLE) * CAST(bc.embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(qvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(bc.embedding[i] AS DOUBLE) * CAST(bc.embedding[i] AS DOUBLE))))), 6) AS cos
      |  FROM bq, bc),
      |branked AS (SELECT qid, vec_id,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
      |  FROM bsims),
      |btop AS (SELECT qid, vec_id FROM branked WHERE rnk <= 5),
      |hits AS (SELECT a.qid, CAST(count(*) AS BIGINT) AS n_hit
      |         FROM atop a JOIN btop b
      |           ON a.qid = b.qid AND a.vec_id = b.vec_id
      |         GROUP BY a.qid),
      |qs AS (SELECT DISTINCT qid FROM btop)
      |SELECT qs.qid, CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
      |  (CAST(coalesce(h.n_hit, 0) AS BIGINT) * 1000000) // 5 AS recall_micro
      |FROM qs LEFT JOIN hits h ON h.qid = qs.qid
      |ORDER BY qs.qid""".stripMargin

  /** Replay of SimilarityOps.annEval: the multi-probe LSH chain, the
    * brute-force truth, and the per-query hit count in one statement. */
  private lazy val simAnnEvalSql: String =
    s"""WITH $simLshChainCtes,
      |${recallGraftSql("emb")}""".stripMargin


  /** The JL projection matrix (SimilarityOps.rpComponent) as a DuckDB
    * nested-list literal — `Double.toString` round-trips (strtod is
    * correctly rounded), so both engines hold the identical 16×64
    * doubles. */
  private[graft] def rpMatrixSql(outDim: Int = 16): String =
    (0 until outDim).map { j =>
      (0 until 64).map(i => graft.ext.SimilarityOps.rpComponent(j, i).toString)
        .mkString("[", ", ", "]")
    }.mkString("[", ", ", "]")


  /** The `outDim`-dim sketch of `embedding` — same in-order fold and
    * 6-decimal component rounding as SimilarityOps.rpProject. */
  private[graft] def rpSketchExpr(outDim: Int): String =
    s"""list_transform(range(1, ${outDim + 1}), j ->
       |    round(list_sum(list_transform(range(1, 65),
       |      i -> CAST(embedding[i] AS DOUBLE) * mat[j][i])), 6))""".stripMargin


  /** Replay of SimilarityOps.rpReduceCsv — the sketch table serialized
    * as micro-unit CSV (components are pre-rounded to 6 decimals, so
    * ×10⁶ + round is an exact integer; long→string renders identically
    * cross-engine where raw double→string does not). */
  private[graft] val simRpReduceSql: String =
    s"""WITH m AS (SELECT ${rpMatrixSql()} AS mat)
       |SELECT vec_id, array_to_string(list_transform(${rpSketchExpr(16)},
       |    x -> CAST(round(x * 1000000) AS BIGINT)), ',') AS reduced
       |FROM embeddings, m ORDER BY vec_id""".stripMargin

  /** Full replay of the RP-sketch ANN (SimilarityOps.rpTopK): sketch
    * every vector, rank candidates per query by sketch cosine
    * (rpAnnDim dims, top rpAnnCandidates, vec_id tie-break), then
    * exact-re-rank the survivors with the 64-dim cosine. Deterministic
    * end to end, so unlike LSH this approximate index hash-checks. */
  // CTE-only form so sim_rp_eval can graft the brute-force truth onto
  // the same chain (the simLshChainCtes pattern)
  private lazy val simRpChainCtes: String = {
    val d = graft.ext.SimilarityOps.rpAnnDim
    val cand = graft.ext.SimilarityOps.rpAnnCandidates
    s"""m AS (SELECT ${rpMatrixSql(d)} AS mat),
       |e AS (SELECT vec_id, embedding, ${rpSketchExpr(d)} AS red
       |  FROM embeddings, m),
       |q AS (SELECT vec_id AS qid, embedding AS qvec, red AS qred
       |  FROM e WHERE vec_id < 5),
       |c AS (SELECT vec_id, embedding, red FROM e WHERE vec_id >= 5),
       |scored AS (SELECT qid, qvec, c.vec_id, c.embedding,
       |    round(${cosSql("qred", "red", d)}, 6) AS rcos
       |  FROM q CROSS JOIN c),
       |surv AS (SELECT qid, qvec, vec_id, embedding FROM (SELECT *,
       |    row_number() OVER (PARTITION BY qid ORDER BY rcos DESC, vec_id ASC) AS crank
       |  FROM scored) z WHERE crank <= $cand),
       |exact AS (SELECT qid, vec_id,
       |    round(${cosSql("qvec", "embedding")}, 6) AS cos FROM surv),
       |ranked AS (SELECT qid, vec_id, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
       |  FROM exact)""".stripMargin
  }

  private lazy val simRpTopKSql: String =
    s"""WITH $simRpChainCtes
       |SELECT qid, rnk AS "rank", vec_id, cos FROM ranked WHERE rnk <= 5
       |ORDER BY qid, rnk""".stripMargin

  /** Replay of SimilarityOps.rpEval: the JL-shortlist chain, the
    * brute-force truth, and the per-query hit count in one statement
    * (same graft as simAnnEvalSql / simPqEvalSql). */
  private lazy val simRpEvalSql: String =
    s"""WITH $simRpChainCtes,
       |${recallGraftSql("embeddings")}""".stripMargin

  /** Replay of SimilarityOps.int8QuantizeCsv: per-dimension exact
    * min/max (float→double values compare exactly), then the identical
    * IEEE expression tree — sub, mul-by-255, div, floor, clamp — per
    * component, serialized as a CSV string (array results are
    * unhashable in the driver's comparator). Degenerate dimensions
    * (max = min) code to 0. */
  // grid CTEs shared by the quantizer face and the int8 serving chain
  private lazy val simInt8GridCtes: String =
    """mm AS (SELECT i, min(CAST(embedding[i] AS DOUBLE)) AS mn,
      |         max(CAST(embedding[i] AS DOUBLE)) AS mx
      |       FROM embeddings, range(1, 65) t(i) GROUP BY i),
      |m AS (SELECT list(mn ORDER BY i) AS mins, list(mx ORDER BY i) AS maxs
      |      FROM mm)""".stripMargin

  private lazy val simInt8QuantSql: String =
    s"""WITH $simInt8GridCtes
      |SELECT vec_id, array_to_string(list_transform(range(1, 65), i ->
      |    CASE WHEN maxs[i] = mins[i] THEN CAST(0 AS BIGINT)
      |         ELSE CAST(least(floor((CAST(embedding[i] AS DOUBLE) - mins[i])
      |                 * 255.0 / (maxs[i] - mins[i])), 255.0) AS BIGINT)
      |    END), ',') AS codes
      |FROM embeddings, m ORDER BY vec_id""".stripMargin

  /** Replay of SimilarityOps.int8TopK: the same grid, the same codes,
    * the same per-query weight/offset folds (identical IEEE operand
    * order), ADC candidate pool of 20, exact cosine re-rank. */
  private lazy val simInt8ChainCtes: String =
    s"""$simInt8GridCtes,
      |corp AS (SELECT vec_id, embedding, list_transform(range(1, 65), i ->
      |    CASE WHEN maxs[i] = mins[i] THEN CAST(0 AS BIGINT)
      |         ELSE CAST(least(floor((CAST(embedding[i] AS DOUBLE) - mins[i])
      |                 * 255.0 / (maxs[i] - mins[i])), 255.0) AS BIGINT)
      |    END) AS codes
      |  FROM embeddings, m WHERE vec_id >= 5),
      |q AS (SELECT vec_id AS qid, embedding AS qv,
      |    list_transform(range(1, 65), i ->
      |      CAST(embedding[i] AS DOUBLE) * (maxs[i] - mins[i]) / 255.0) AS w,
      |    list_sum(list_transform(range(1, 65), i ->
      |      CAST(embedding[i] AS DOUBLE) * mins[i])) AS adc_offset
      |  FROM embeddings, m WHERE vec_id < 5),
      |ap AS (SELECT q.qid, c.vec_id, q.qv, c.embedding,
      |    q.adc_offset + list_sum(list_transform(range(1, 65), i ->
      |      CAST(c.codes[i] AS DOUBLE) * q.w[i])) AS approx
      |  FROM q, corp c),
      |cand AS (SELECT qid, vec_id, qv, embedding FROM (SELECT *,
      |    row_number() OVER (PARTITION BY qid
      |      ORDER BY approx DESC, vec_id ASC) AS crn
      |  FROM ap) z WHERE crn <= ${graft.ext.SimilarityOps.int8Rerank}),
      |sims AS (SELECT qid, vec_id, round(
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(qv[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(range(1, 65),
      |         i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))), 6) AS cos
      |  FROM cand),
      |ranked AS (SELECT qid, vec_id, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rnk
      |  FROM sims)""".stripMargin

  private lazy val simInt8TopKSql: String =
    s"""WITH $simInt8ChainCtes
      |SELECT qid, rnk AS "rank", vec_id, cos FROM ranked WHERE rnk <= 5
      |ORDER BY qid, rnk""".stripMargin

  /** Replay of SimilarityOps.int8Eval (same graft as simAnnEvalSql;
    * the truth reads the raw table — identical rows to the chain's
    * q/corp split). */
  private lazy val simInt8EvalSql: String =
    s"""WITH $simInt8ChainCtes,
      |${recallGraftSql("embeddings")}""".stripMargin


  /** Fixed-point replay of SimilarityOps.labelCentroids: floor(v·2^20)
    * longs sum exactly in any order, then one int→double division —
    * bit-identical across engines with no ordered fold. */
  private[graft] val simLabelCentroidsSql: String =
    """SELECT label, i AS pos,
      |  CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT)) AS DOUBLE)
      |    / CAST(count(*) * 1048576 AS DOUBLE) AS centroid
      |FROM embeddings, range(1, 65) t(i)
      |GROUP BY label, i ORDER BY label, pos""".stripMargin


  /** Label-outlier replay: identical exact arithmetic — qv = ⌊v·2²⁰⌋,
    * n²·d² = Σ(qv·n − Σqv)² in DECIMAL(19,0)×DECIMAL(19,0) products
    * (38-digit width holds in both engines), presentation distance via
    * correctly-rounded sqrt + one division. */
  private[graft] val simLabelOutliersSql: String =
    """WITH q AS (SELECT vec_id, label, i AS pos,
      |             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS qv
      |           FROM embeddings, range(1, 65) t(i)),
      |m AS (SELECT label, pos, sum(qv) AS sq, count(*) AS n
      |      FROM q GROUP BY label, pos),
      |d AS (SELECT vec_id, label, n,
      |        sum(CAST(qv * n - sq AS DECIMAL(19,0)) *
      |            CAST(qv * n - sq AS DECIMAL(19,0))) AS n2d2
      |      FROM q JOIN m USING (label, pos) GROUP BY vec_id, label, n),
      |r AS (SELECT label, vec_id, n, n2d2,
      |        row_number() OVER (PARTITION BY label ORDER BY n2d2 DESC, vec_id) AS rank
      |      FROM d)
      |SELECT label, rank, vec_id,
      |  round(sqrt(CAST(n2d2 AS DOUBLE)) / (CAST(n AS DOUBLE) * 1048576.0), 6) AS dist
      |FROM r WHERE rank <= 3 ORDER BY label, rank""".stripMargin


  private[graft] val simEmbeddingStatsSql: String =
    """SELECT vec_id, label,
      |  round(sqrt(list_sum(list_transform(range(1, 65),
      |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))), 6) AS norm,
      |  CAST(len(embedding) AS BIGINT) AS dim
      |FROM embeddings ORDER BY vec_id""".stripMargin

  private[graft] def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_bruteforce_topk" -> ((s, d) => SimilarityOps.bruteForceTopK(s, d)),
    "sim_mmr" -> ((s, d) => SimilarityOps.mmrSelect(s, d)),
    "sim_dim_curve" -> ((s, d) => SimilarityOps.dimCurve(s, d)),
    "sim_lsh_topk" -> ((s, d) => SimilarityOps.lshTopK(s, d)),
    "sim_ann_eval" -> ((s, d) => SimilarityOps.annEval(s, d)),
    "sim_ivf_topk" -> ((s, d) => SimilarityOps.ivfTopK(s, d)),
    // full probe (nProbe = nCentroids) makes IVF provably exact: every
    // posting list is scanned, so the result must equal brute force —
    // the recall knob checked at its endpoint by the brute-force oracle
    "sim_ivf_fullprobe" -> ((s, d) => SimilarityOps.ivfTopK(s, d, nCentroids = 16, nProbe = 16)),
    // recall@5 of the DEFAULT 4-probe serving budget vs brute force —
    // the eval-family member fullprobe can't be (it is exact)
    "sim_ivf_eval" -> ((s, d) => SimilarityOps.ivfEval(s, d)),
    // recall per probe budget (1..16 of 16) — the serving-cost curve;
    // the 16-probe rows anchor at exactly 10^6 (full probe ≡ truth)
    "sim_ivf_curve" -> ((s, d) => SimilarityOps.ivfCurve(s, d)),
    // the PERSISTED index on its serving path: build the parquet
    // artifact once per session, query with literal-cid partition
    // pruning; identical training ⇒ row-identical to sim_ivf_topk, so
    // the trained-replay oracle hash-checks the pruned artifact path
    "sim_ivf_served" -> ((s, d) => SimilarityOps.ivfServedTopK(s, d)),
    // JL random-projection sketch family: the reduced-vector artifact
    // and the sketch-filter/exact-verify ANN built on it — fully
    // deterministic. The artifact face registers CSV-serialized (raw
    // array columns are unhashable in the driver's pandas comparator —
    // the orderKeyArraysCsv precedent); the typed array stays pinned by
    // RpSketchSpec.
    "sim_rp_reduce" -> ((s, d) => SimilarityOps.rpReduceCsv(s, d)),
    "sim_rp_topk" -> ((s, d) => SimilarityOps.rpTopK(s, d)),
    "sim_rp_eval" -> ((s, d) => SimilarityOps.rpEval(s, d)),
    // the persisted sketch artifact on its serving path (the candidate
    // scan never reads the wide embedding column); ≡ sim_rp_topk
    "sim_rp_served" -> ((s, d) => SimilarityOps.rpServedTopK(s, d)),
    // int8 scalar quantization: per-dim [min,max] grid, 4× compression
    // (CSV-serialized codes for the gate; typed face in SimilaritySpec)
    "sim_int8_quant" -> ((s, d) => SimilarityOps.int8QuantizeCsv(s, d)),
    "sim_int8_topk" -> ((s, d) => SimilarityOps.int8TopK(s, d)),
    "sim_int8_eval" -> ((s, d) => SimilarityOps.int8Eval(s, d)),
    "sim_near_dups" -> ((s, d) => SimilarityOps.embeddingNearDups(s, d)),
    // corpus-wide kNN graph over the banded candidates, per-vector
    // top-3 on the native bounded-heap exec (SemDeDup's input table)
    "sim_knn_graph" -> ((s, d) => SimilarityOps.knnGraph(s, d)),
    "sim_clusters" -> ((s, d) => SimilarityOps.semanticClusters(s, d)),
    "sim_semantic_keeper" -> ((s, d) => SimilarityOps.semanticKeeper(s, d)),
    "sim_decontaminate" -> ((s, d) => SimilarityOps.semanticDecontaminate(s, d)),
    "sim_embedding_stats" -> ((s, d) => SimilarityOps.embeddingStats(s, d)),
    "sim_label_centroids" -> ((s, d) => SimilarityOps.labelCentroids(s, d)),
    "sim_label_outliers" -> ((s, d) => SimilarityOps.labelOutliers(s, d)),
    "sim_pq_topk" -> ((s, d) => SimilarityOps.pqTopK(s, d)),
    "sim_pq_eval" -> ((s, d) => SimilarityOps.pqEval(s, d)),
    "sim_pq_exact" -> ((s, d) => SimilarityOps.pqExact(s, d))
  )

  private[graft] def oracleSql: Map[String, String] = Map(
    "sim_bruteforce_topk" -> simBruteForceSql,
    "sim_mmr" -> simMmrSql,
    "sim_dim_curve" -> simDimCurveSql,
    "sim_ivf_fullprobe" -> simBruteForceSql,
    // sim_pq_exact: lossless codebook (every subvector its own centroid)
    // => reconstruction is bit-identical => PQ scoring ≡ brute force —
    // on the bounded vec_id < 256 slice (the lossless codebook is a copy
    // of its corpus, so the exactness endpoint must not scale with it).
    "sim_pq_exact" -> simBruteForceCappedSql,
    // sim_ivf_topk / sim_pq_topk: the TRAINED faces are deterministic
    // (fixed-point Lloyd's means, cosine-argmax assignment), so the
    // oracle replays training end to end — see simIvfTopKSql/simPqTopKSql.
    "sim_ivf_topk" -> simIvfTopKSql,
    "sim_ivf_eval" -> simIvfEvalSql,
    "sim_ivf_curve" -> simIvfCurveSql,
    // the persisted-index serving path trains identically to the inline
    // face (same deterministic Lloyd's, same probe math), so the same
    // trained replay covers it — now exercised through cid partition
    // pruning over the parquet artifact
    "sim_ivf_served" -> simIvfTopKSql,
    "sim_pq_topk" -> simPqTopKSql,
    "sim_pq_eval" -> simPqEvalSql,
    // sim_lsh_topk / sim_near_dups: the LCG hyperplanes and in-order
    // dot folds are engine-exact, so the oracle replays bucketing,
    // probing, and verification bit-for-bit.
    "sim_near_dups" -> simNearDupsSql,
    "sim_knn_graph" -> simKnnGraphSql,
    "sim_clusters" -> simClustersSql,
    "sim_semantic_keeper" -> simSemanticKeeperSql,
    "sim_decontaminate" -> simDecontaminateSql,
    "sim_lsh_topk" -> simLshTopKSql,
    "sim_ann_eval" -> simAnnEvalSql,
    "sim_rp_reduce" -> simRpReduceSql,
    "sim_int8_quant" -> simInt8QuantSql,
    "sim_int8_topk" -> simInt8TopKSql,
    "sim_int8_eval" -> simInt8EvalSql,
    "sim_rp_topk" -> simRpTopKSql,
    "sim_rp_eval" -> simRpEvalSql,
    // row-identical to sim_rp_topk (RpSketchSpec pins it), served from
    // the persisted sketch artifact
    "sim_rp_served" -> simRpTopKSql,
    "sim_embedding_stats" -> simEmbeddingStatsSql,
    "sim_label_centroids" -> simLabelCentroidsSql,
    "sim_label_outliers" -> simLabelOutliersSql
  )
}
