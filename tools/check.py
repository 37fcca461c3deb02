#!/usr/bin/env python3
"""Local differential check mirroring the driver's t2 gate.

Usage: python3 tools/check.py <verify_out_dir> [sf_dir] [key ...]

Reads each <out>/<name> parquet (Spark result), runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the sf parquet
tables, and compares: column names (sorted), row count, and values
row-by-row in emitted order. Trailing args restrict the check to the
named keys (fast iteration on one oracle). Dev tool only — NOT part of
the shipped library (the engine itself has zero non-Spark deps).
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonicalize a cell for comparison across engines."""
    import decimal, datetime
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, decimal.Decimal):
        return ("d", format(v.normalize(), "f"))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return ("t", str(v))
    if isinstance(v, list):
        return ("l", tuple(canon(x) for x in v))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    return ("o", str(v)) if v is not None else ("n",)


def main():
    out = Path(sys.argv[1])
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    oracle = json.loads((out / "oracle_sql.json").read_text())
    if len(sys.argv) > 3:
        keys = set(sys.argv[3:])
        unknown = keys - oracle.keys()
        if unknown:
            sys.exit(f"unknown keys: {sorted(unknown)}")
        oracle = {k: v for k, v in oracle.items() if k in keys}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    n_pass = n_fail = 0
    fails = []
    for name, sql in sorted(oracle.items()):
        spark_dir = out / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1; fails.append(name); continue
        try:
            sp = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            sp_cols = [c[0] for c in sp.description]
            sp_rows = sp.fetchall()
            du = con.execute(sql)
            du_cols = [c[0] for c in du.description]
            du_rows = du.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1; fails.append(name); continue

        if sorted(sp_cols) != sorted(du_cols):
            print(f"FAIL {name}: cols spark={sorted(sp_cols)} duck={sorted(du_cols)}")
            n_fail += 1; fails.append(name); continue
        if len(sp_rows) != len(du_rows):
            print(f"FAIL {name}: rows spark={len(sp_rows)} duck={len(du_rows)}")
            n_fail += 1; fails.append(name); continue
        # column-name-sorted projection, row order as emitted
        sp_ix = [sp_cols.index(c) for c in sorted(sp_cols)]
        du_ix = [du_cols.index(c) for c in sorted(du_cols)]
        bad = None
        for i, (a, b) in enumerate(zip(sp_rows, du_rows)):
            ca = tuple(canon(a[j]) for j in sp_ix)
            cb = tuple(canon(b[j]) for j in du_ix)
            if ca != cb:
                # tolerate decimal-vs-decimal trailing scale diffs only
                bad = (i, ca, cb)
                break
        if bad:
            i, ca, cb = bad
            print(f"FAIL {name}: row {i} differs\n  spark={ca}\n  duck ={cb}")
            n_fail += 1; fails.append(name)
        else:
            print(f"PASS {name} ({len(sp_rows)} rows)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail" + (f": {fails}" if fails else ""))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
