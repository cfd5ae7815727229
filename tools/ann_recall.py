#!/usr/bin/env python3
"""ANN quality tracking: recall@k of each approximate top-k query
(sim_lsh_topk / sim_ivf_topk / sim_pq_topk) against the exact
brute-force result (sim_bruteforce_topk), per query id, from a
graft.Verify output directory.

Usage: python3 tools/ann_recall.py <verifyOutDir>

Recall@k = |approx ∩ exact| / |exact| averaged over query ids, where
each set is the vec_id list for that qid. Run per round at sf0.1 so ANN
quality is tracked round-over-round, not just at registration.
"""
import sys

import duckdb

def main():
    out = sys.argv[1]
    con = duckdb.connect()
    exact = f"read_parquet('{out}/sim_bruteforce_topk/*.parquet')"
    for name in ("sim_lsh_topk", "sim_ivf_topk", "sim_pq_topk",
                 "sim_rp_topk"):
        approx = f"read_parquet('{out}/{name}/*.parquet')"
        row = con.execute(f"""
            WITH e AS (SELECT qid, vec_id FROM {exact}),
            a AS (SELECT qid, vec_id FROM {approx}),
            per AS (
              SELECT e.qid,
                count(a.vec_id) AS hit,
                count(*) AS k
              FROM e LEFT JOIN a ON e.qid = a.qid AND e.vec_id = a.vec_id
              GROUP BY e.qid)
            SELECT avg(CAST(hit AS DOUBLE) / CAST(k AS DOUBLE)),
                   min(CAST(hit AS DOUBLE) / CAST(k AS DOUBLE)),
                   count(*) FROM per""").fetchone()
        print(f"{name}: recall@k avg={row[0]:.3f} min={row[1]:.3f} "
              f"over {row[2]} query ids")

if __name__ == "__main__":
    main()
