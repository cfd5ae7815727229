#!/usr/bin/env python3
"""Mint BASELINE_QUERIES.json from a certified BENCH_DETAIL.json, per
BASELINE.md's re-anchor policy. Refuses a contaminated or gauge-less
window; records the full window metadata (including cal_mem_med) so
future diffs carry the bandwidth annotation, and preserves the previous
anchor's identity + shared-warm-total in _meta.anchor_history.

Usage: python3 tools/make_baseline.py <BENCH_DETAIL.json> <note> [out]
"""
import json
import sys

WINDOW_KEYS = (
    "sf", "runs", "n_ok", "n_err", "load_start", "load_end",
    "foreign_cpu", "steal_cpu", "cal_start", "cal_end", "cal_par_start",
    "cal_par_end", "cal_mem_start", "cal_mem_end", "cal_mem_start_min",
    "cal_mem_start_max", "cal_mem_end_min", "cal_mem_end_max",
    "cal_mem_med", "cal_mem_mid", "cal_sched_start", "cal_sched_end",
    "cal_sched_start_min", "cal_sched_start_max", "cal_sched_end_min",
    "cal_sched_end_max", "n_dirty", "build_total")


def main():
    detail_path = sys.argv[1]
    note = sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "BASELINE_QUERIES.json"
    detail = json.load(open(detail_path))

    if detail.get("contaminated"):
        sys.exit("refusing: window is marked contaminated")
    if not isinstance(detail.get("cal_mem_med"), (int, float)):
        sys.exit("refusing: window carries no cal_mem_med — the policy "
                 "requires the bandwidth gauge on any new anchor")

    try:
        prev = json.load(open(out))
        shared = set(prev["queries"]) & set(detail["queries"])
        prev_tot = sum(prev["queries"][k].get("warm_med", 0) for k in shared)
        new_tot = sum(detail["queries"][k].get("warm_med", 0)
                      for k in shared)
        history = {
            "prev_source": prev.get("_meta", {}).get("source"),
            "prev_shared_warm_total": round(prev_tot, 1),
            "this_window_shared_warm_total": round(new_tot, 1),
        }
    except FileNotFoundError:
        history = None

    meta = {
        "source": note,
        "purpose": ("per-query forward baseline for the 2x perf gate: "
                    "machine-diff a new CERTIFIED idle BENCH_DETAIL "
                    "against these rows with tools/diff_baseline.py "
                    "(1.5x-and-material threshold, cal_mem-annotated)"),
        "window": {k: detail[k] for k in WINDOW_KEYS if k in detail},
    }
    if history:
        meta["anchor_history"] = history

    body = {"_meta": meta, "queries": detail["queries"]}
    json.dump(body, open(out, "w"), indent=1)
    print(f"wrote {out}: {len(body['queries'])} queries; history={history}")


if __name__ == "__main__":
    main()
