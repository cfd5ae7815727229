#!/usr/bin/env python3
"""Cross-engine fuzz harness: RANDOM corpora through the oracle gate.

The per-round correctness gate replays every query against DuckDB on
the FIXED driver testdata — strong, but one corpus. This harness
generates adversarial random corpora (empty/whitespace/unicode docs,
exact and near duplicates, gapped event days, planted near-dup
embeddings, degenerate labels) and runs the documents/events/embeddings
query families through the SAME Verify + check_correctness pipeline.
A mismatch here is a real cross-engine divergence the fixed corpus
never exercised.

Usage: python3 tools/fuzz_oracle.py [n_seeds] [seed0]
Writes corpora under /tmp/graft_fuzz/<seed>/ and prints one PASS/FAIL
line per seed; exits nonzero on any failure.
"""
import json
import os
import random
import shutil
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORDS = (
    "the of and to in a is that for it as was with be by on not he this are "
    "or his from at which but have an had they you were their one all we can "
    "her has there been if more when will would who so no out up into than "
    "data engine spark query table column window stream batch shard corpus "
    "héllo wörld café naïve über 日本 語で 中文 текст słowo").split()

TYPES = ["click", "view", "error", "purchase", "signup"]


def gen_documents(rng, n):
    rows = []
    base_texts = []
    for i in range(n):
        r = rng.random()
        if r < 0.04:
            text = ""
        elif r < 0.07:
            text = "   \t  "
        elif r < 0.15 and base_texts:
            text = rng.choice(base_texts)  # exact duplicate
        elif r < 0.28 and base_texts:
            # near duplicate: mutate ~5% of one base doc's words
            t = rng.choice(base_texts).split()
            for _ in range(max(1, len(t) // 20)):
                if t:
                    t[rng.randrange(len(t))] = rng.choice(WORDS)
            text = " ".join(t)
        else:
            nw = rng.randint(1, 140)
            text = " ".join(rng.choice(WORDS) for _ in range(nw))
            if nw >= 20:
                base_texts.append(text)
        rows.append((i, text, rng.choice(["en", "fr", "de", "zz"]),
                     f"src{rng.randrange(4)}", len(text)))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })


def gen_events(rng, n_users=40, n_days=45):
    # leave a contiguous gap of days with NO events (the dense-CUSUM
    # grid must agree across engines on gap days too)
    gap0 = rng.randrange(10, 25)
    gap1 = gap0 + rng.randrange(3, 8)
    day0_us = 1704067200000000  # 2024-01-01 UTC in micros
    rows = []
    eid = 0
    for d in range(n_days):
        if gap0 <= d < gap1:
            continue
        for _ in range(rng.randrange(5, 60)):
            us = day0_us + d * 86400000000 + rng.randrange(86400000000)
            rows.append((eid, us, rng.randrange(n_users),
                         rng.choice(TYPES), round(rng.uniform(0, 50), 2),
                         '{"k": %d}' % rng.randrange(100)))
            eid += 1
    rows.sort(key=lambda r: r[1])
    rows = [(i,) + r[1:] for i, r in enumerate(rows)]
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    })


def gen_embeddings(rng, n):
    vecs = []
    for i in range(n):
        if i > 10 and rng.random() < 0.25:
            # near-duplicate of an earlier vector: tiny perturbation
            src = list(vecs[rng.randrange(len(vecs))])
            j = rng.randrange(64)
            src[j] = src[j] + rng.uniform(-0.01, 0.01)
            vecs.append(src)
        else:
            vecs.append([rng.uniform(-0.3, 0.3) for _ in range(64)])
    # float32 round-trip NOW so what Spark reads == what DuckDB reads
    f32 = [[float(pa.scalar(x, pa.float32()).as_py()) for x in v]
           for v in vecs]
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(f32, pa.list_(pa.float32())),
        "label": pa.array([rng.randrange(4) for _ in range(n)], pa.int32()),
    })


def money(rng, lo, hi):
    return round(rng.uniform(lo, hi), 2)


def gen_tpch(rng, d):
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    pq.write_table(pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(regions, pa.string())}), f"{d}/region.parquet")
    n_nat = 10
    pq.write_table(pa.table({
        "n_nationkey": pa.array(range(n_nat), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(n_nat)], pa.string()),
        "n_regionkey": pa.array([rng.randrange(5) for _ in range(n_nat)],
                                pa.int32())}), f"{d}/nation.parquet")
    segs = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
    n_cust = 30
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(1, n_cust + 1), pa.int64()),
        "c_name": pa.array([f"Customer#{i}" for i in range(1, n_cust + 1)]),
        "c_nationkey": pa.array([rng.randrange(n_nat) for _ in range(n_cust)],
                                pa.int32()),
        # plant boundary balances around the q_outer_full 9000 filter
        "c_acctbal": pa.array(
            [9000.0 if i == 1 else money(rng, -999, 11000)
             for i in range(1, n_cust + 1)], pa.float64()),
        "c_mktsegment": pa.array([rng.choice(segs) for _ in range(n_cust)]),
    }), f"{d}/customer.parquet")
    n_supp = 10
    pq.write_table(pa.table({
        "s_suppkey": pa.array(range(1, n_supp + 1), pa.int64()),
        "s_name": pa.array([f"Supplier#{i}" for i in range(1, n_supp + 1)]),
        "s_nationkey": pa.array([rng.randrange(n_nat) for _ in range(n_supp)],
                                pa.int32()),
        "s_acctbal": pa.array([money(rng, -999, 11000) for _ in range(n_supp)],
                              pa.float64())}), f"{d}/supplier.parquet")
    n_part = 40
    types = ["ECONOMY", "MEDIUM", "LARGE", "STANDARD", "SMALL", "PROMO"]
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(1, n_part + 1), pa.int64()),
        "p_name": pa.array([f"part {i}" for i in range(1, n_part + 1)]),
        "p_brand": pa.array([f"Brand#{rng.randrange(1, 26)}"
                             for _ in range(n_part)]),
        "p_type": pa.array([rng.choice(types) for _ in range(n_part)]),
        "p_size": pa.array([rng.randrange(1, 51) for _ in range(n_part)],
                           pa.int32()),
        "p_retailprice": pa.array([money(rng, 900, 2000)
                                   for _ in range(n_part)], pa.float64()),
    }), f"{d}/part.parquet")
    day0_us = 788918400000000  # 1995-01-01 UTC
    span_days = 2400           # through mid-2001 (covers the 95/96 sketches)
    n_ord = 200
    statuses = ["O", "F", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    # some customers never order (outer joins must emit them)
    cust_pool = [c for c in range(1, n_cust + 1) if c % 7 != 0]
    odates = [day0_us + rng.randrange(span_days) * 86400000000
              for _ in range(n_ord)]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(1, n_ord + 1), pa.int64()),
        "o_custkey": pa.array([rng.choice(cust_pool) for _ in range(n_ord)],
                              pa.int64()),
        "o_orderstatus": pa.array([rng.choice(statuses) for _ in range(n_ord)]),
        "o_totalprice": pa.array([money(rng, 1000, 300000)
                                  for _ in range(n_ord)], pa.float64()),
        "o_orderdate": pa.array(odates, pa.timestamp("us")),
        "o_orderpriority": pa.array([rng.choice(prios) for _ in range(n_ord)]),
    }), f"{d}/orders.parquet")
    rows = []
    for ok in range(1, n_ord + 1):
        if ok % 11 == 0:
            continue  # orders with NO lineitems (outer joins / anti joins)
        for ln in range(1, rng.randrange(1, 6) + 1):
            rows.append((
                ok, rng.randrange(1, n_part + 1), rng.randrange(1, n_supp + 1),
                ln, float(rng.randrange(1, 51)), money(rng, 900, 100000),
                round(rng.uniform(0, 0.1), 2), round(rng.uniform(0, 0.08), 2),
                rng.choice(["A", "N", "R"]), rng.choice(["O", "F"]),
                odates[ok - 1] + rng.randrange(1, 120) * 86400000000))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
        "l_linenumber": pa.array([r[3] for r in rows], pa.int32()),
        "l_quantity": pa.array([r[4] for r in rows], pa.float64()),
        "l_extendedprice": pa.array([r[5] for r in rows], pa.float64()),
        "l_discount": pa.array([r[6] for r in rows], pa.float64()),
        "l_tax": pa.array([r[7] for r in rows], pa.float64()),
        "l_returnflag": pa.array([r[8] for r in rows], pa.string()),
        "l_linestatus": pa.array([r[9] for r in rows], pa.string()),
        "l_shipdate": pa.array([r[10] for r in rows], pa.timestamp("us")),
    }), f"{d}/lineitem.parquet")


# families whose inputs this harness generates; cp_* (fixture listings,
# independent of the corpus dir) stay on the fixed-corpus gate
PREFIXES = ("text_", "dedup_", "ev_", "sim_", "mm_", "samp_",
            "q_", "q1_", "q3_", "q5_")
# faces that hold per-corpus trained/served state in session memos keyed
# by dir are safe (dir differs per seed); nothing excluded by default
EXCLUDE = set()


def run_cp_seed(seed):
    """Control-plane phase: randomized listings / kubectl docs /
    durations / manifests / Times events via graft.FuzzCp (the same
    CpFaces builders the registry uses), checked by the same
    comparator. Covers the 11 cp_* faces the corpus phase cannot (their
    inputs are fixtures, not the corpus dir)."""
    d = f"/tmp/graft_fuzz/cp{seed}"
    shutil.rmtree(d, ignore_errors=True)
    try:
        r = subprocess.run(
            ["sbt", "-batch", f"runMain graft.FuzzCp {seed} {d}"],
            cwd=REPO, capture_output=True, text=True, timeout=1800)
    except subprocess.TimeoutExpired:
        print(f"seed {seed}: CP FUZZ TIMEOUT")
        return False
    errs = [l for l in r.stderr.splitlines() if "[verify]" in l]
    if errs or r.returncode != 0:
        print(f"seed {seed}: CP FUZZ ERRORS")
        for e in errs[:10]:
            print("  ", e)
        return False
    try:
        c = subprocess.run(
            [sys.executable, "tools/check_correctness.py", d, d],
            cwd=REPO, capture_output=True, text=True, timeout=600)
    except subprocess.TimeoutExpired:
        print(f"seed {seed}: CP CHECKER TIMEOUT")
        return False
    tail = c.stdout.strip().splitlines()[-1] if c.stdout.strip() else "?"
    ok = "ALL GREEN" in tail
    print(f"seed {seed} [cp]: {tail}" if ok
          else f"seed {seed} [cp]: FAIL\n{c.stdout[-4000:]}")
    return ok


def run_stream_seed(seed):
    """Streaming phase: replay the seed's random corpus through the
    streaming surfaces (CusumStream merge/commit, DedupStream digest
    admission, ScoreStream/DsirStream serving) in seed-randomized
    chunkings with duplicate-batch replays, asserting streamed == batch
    (graft.FuzzStream). Needs run_seed's corpus dir on disk."""
    d = f"/tmp/graft_fuzz/{seed}"
    try:
        r = subprocess.run(
            ["sbt", "-batch", f"runMain graft.FuzzStream {seed} {d}"],
            cwd=REPO, capture_output=True, text=True, timeout=1800)
    except subprocess.TimeoutExpired:
        print(f"seed {seed}: STREAM FUZZ TIMEOUT")
        return False
    fails = [l for l in r.stdout.splitlines() if "[fuzzstream] FAIL" in l]
    ok = r.returncode == 0 and not fails and "ALL OK" in r.stdout
    if ok:
        print(f"seed {seed} [stream]: ALL OK")
    else:
        print(f"seed {seed} [stream]: FAIL")
        for f in fails[:10]:
            print("  ", f)
        if not fails:
            print(r.stdout[-2000:], r.stderr[-1000:])
    return ok


def run_seed(seed):
    d = f"/tmp/graft_fuzz/{seed}"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    rng = random.Random(seed)
    pq.write_table(gen_documents(rng, 100), f"{d}/documents.parquet")
    pq.write_table(gen_events(rng), f"{d}/events.parquet")
    pq.write_table(gen_embeddings(rng, 100), f"{d}/embeddings.parquet")
    gen_tpch(rng, d)

    # query subset from the committed registry (any prior verify dump)
    names = sorted(n for n in json.load(
        open(f"{d}/../oracle_sql.json")) if n.startswith(PREFIXES)
        and n not in EXCLUDE)
    out = f"{d}/out"
    try:
        r = subprocess.run(
            ["sbt", "-batch",
             f"runMain graft.Verify {d} {out} {','.join(names)}"],
            cwd=REPO, capture_output=True, text=True, timeout=3600)
    except subprocess.TimeoutExpired:
        print(f"seed {seed}: VERIFY TIMEOUT")
        return False
    errs = [l for l in r.stderr.splitlines() if "[verify]" in l]
    if errs or r.returncode != 0:
        print(f"seed {seed}: VERIFY ERRORS")
        for e in errs[:10]:
            print("  ", e)
        return False
    try:
        c = subprocess.run(
            [sys.executable, "tools/check_correctness.py", d, out],
            cwd=REPO, capture_output=True, text=True, timeout=3600)
    except subprocess.TimeoutExpired:
        print(f"seed {seed}: CHECKER TIMEOUT")
        return False
    tail = c.stdout.strip().splitlines()[-1] if c.stdout.strip() else "?"
    ok = "ALL GREEN" in tail
    print(f"seed {seed}: {tail}" if ok else f"seed {seed}: FAIL\n{c.stdout[-4000:]}")
    return ok


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    os.makedirs("/tmp/graft_fuzz", exist_ok=True)
    # registry snapshot for the name list
    src = "/tmp/vout/oracle_sql.json"
    if not os.path.exists(src):
        sys.exit("need a prior Verify dump at /tmp/vout for the name list")
    shutil.copy(src, "/tmp/graft_fuzz/oracle_sql.json")
    bad = [s for s in range(seed0, seed0 + n)
           if not (run_seed(s) and run_cp_seed(s) and run_stream_seed(s))]
    if bad:
        sys.exit(f"FUZZ FAILURES: seeds {bad}")
    print(f"fuzz: {n} seeds ALL GREEN")


if __name__ == "__main__":
    main()
