#!/usr/bin/env python3
"""Lint oracle SQL for the DuckDB HUGEINT widening trap.

Usage: python3 tools/lint_oracle.py <verify_out_dir> [sf_dir]

DuckDB widens sum(BIGINT) to HUGEINT; the driver's pandas bridge turns
HUGEINT into float64, so a Spark int64 column hash-mismatches even when
every value is identical. This trap has fired three rounds apart
(win_session r7, graph_pagerank r8, agg_entropy r9) — always fixed by
`CAST(sum(x) AS BIGINT)` in the oracle's FINAL projection.

This lint catches it without Spark: DESCRIBE each oracle query and flag
any output column DuckDB types as HUGEINT (or UHUGEINT). Dev tool only,
like check.py — not part of the shipped library.
"""
import json, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    out = Path(sys.argv[1])
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # a broken oracle is check.py's problem
            print(f"SKIP {name}: DESCRIBE failed: {e}")
            continue
        huge = [(c[0], c[1]) for c in cols if "HUGEINT" in str(c[1]).upper()]
        if huge:
            bad.append((name, huge))
            for col, typ in huge:
                print(f"FLAG {name}: column '{col}' is {typ} — wrap in "
                      f"CAST(... AS BIGINT) in the oracle's final projection")
    print(f"\n{len(oracle)} oracles linted, {len(bad)} flagged")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
