#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views
over <sfDir>/*.parquet, and compares: row count, column names, and values
(columns sorted by name, rows sorted by all columns). Exact equality for
all types including floats — the driver hashes, so we must be bit-identical.
"""
import json
import os
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


NUMERIC_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                 "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT",
                 "FLOAT", "DOUBLE"}


def num_flavor(t):
    """Numeric flavor string, or None if the type is non-numeric.

    The driver's hasher distinguishes int64 from int128 from double, so
    BIGINT vs HUGEINT (DuckDB SUM widening) or BIGINT vs DOUBLE must FAIL
    here even when every value compares equal."""
    t = str(t).upper()
    if t in NUMERIC_TYPES or t.startswith("DECIMAL"):
        return t
    return None


def dtype_mismatches(cols_a, types_a, cols_b, types_b):
    """Pairs columns by name; returns (strict numeric mismatches, warnings)."""
    ta = {c: t for c, t in zip(cols_a, types_a)}
    tb = {c: t for c, t in zip(cols_b, types_b)}
    strict, warn = [], []
    for c in sorted(set(ta) & set(tb)):
        fa, fb = num_flavor(ta[c]), num_flavor(tb[c])
        if str(ta[c]).upper() == str(tb[c]).upper():
            continue
        if fa is not None or fb is not None:
            strict.append(f"{c}: spark={ta[c]} duck={tb[c]}")
        else:
            warn.append(f"{c}: spark={ta[c]} duck={tb[c]}")
    return strict, warn


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((v is None, str(type(v)), str(v)) for v in t))
    return [sorted(colnames), out]


def norm(v):
    # normalize numeric types so int32 vs int64 etc. compare equal;
    # floats stay exact (repr keeps full precision)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("num", float(v)) if abs(v) < 2**52 else ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("num", v) if v == int(v) and abs(v) < 2**52 and v.is_integer() else ("float", repr(v))
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        # normalize datetime vs date midnight? keep as-is but strip tz
        return ("ts", s.replace("+00:00", ""))
    if isinstance(v, list):
        return ("list", tuple(norm(x) for x in v))
    return ("o", str(v))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # pin the session timezone: oracles avoid TIMESTAMPTZ, but any stray
    # tz-aware render must not depend on the host's local zone
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        # tolerate partial corpora (a fuzz/scratch dir need not carry
        # every table; queries over a missing view fail individually)
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import glob
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*")
                   if not d.endswith(".json"))
    for name in names:
        spark_rel = con.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        spark_cols = list(spark_rel.columns)
        spark_types = list(spark_rel.types)
        spark_rows = spark_rel.fetchall()
        # The driver's pandas-based comparator cannot sort/hash ndarray
        # cells ('unhashable type: numpy.ndarray'), so ANY oracle-checked
        # query with an array/list result column errs there even when the
        # values are right (r10: sim_rp_reduce, sim_int8_quant). Fail it
        # here at registration time instead of list-normalizing it away:
        # serialize such columns (concat_ws / array_to_string — the
        # orderKeyArraysCsv precedent) before registering.
        arr_cols = [c for c, t in zip(spark_cols, spark_types)
                    if "[]" in str(t) or str(t).upper().startswith(("LIST", "STRUCT", "MAP"))]
        if name in oracle and arr_cols:
            print(f"FAIL {name}: array/list result columns {arr_cols} — "
                  "the driver's pandas comparator cannot hash these; "
                  "register a CSV-serialized face instead")
            failures += 1
            continue
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(spark_rows)} rows")
            continue
        try:
            duck_rel = con.sql(oracle[name])
            duck_cols = list(duck_rel.columns)
            duck_types = list(duck_rel.types)
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        sc, sr = canon(spark_rows, spark_cols)
        dc, dr = canon(duck_rows, duck_cols)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            failures += 1
            continue
        strict, warn = dtype_mismatches(spark_cols, spark_types,
                                        duck_cols, duck_types)
        for w in warn:
            print(f"  warn {name}: dtype flavor differs ({w})")
        if strict:
            print(f"FAIL {name}: numeric dtype mismatch "
                  f"(driver hashes dtypes): {'; '.join(strict)}")
            failures += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            failures += 1
            continue
        bad = [(a, b) for a, b in zip(sr, dr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(sr)} mismatched rows; first 3:")
            for a, b in bad[:3]:
                print(f"    spark={a}")
                print(f"    duck ={b}")
            failures += 1
        else:
            print(f"  OK {name}: {len(sr)} rows")
    print(f"\n{'ALL GREEN' if failures == 0 else str(failures) + ' FAILURES'}"
          f" ({len(names)} queries)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
