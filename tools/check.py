#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet produced by graft.Verify, runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB against the sf parquet
tables, and compares: row count, column names, and values (columns sorted
by name, rows sorted by all columns, NaN-safe, exact).
Driver-side tooling only — not part of the Spark library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb


def canon(rows):
    out = []
    for r in rows:
        canon_r = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    canon_r.append("NaN")
                else:
                    canon_r.append(repr(v))
            else:
                canon_r.append(repr(v))
        out.append(tuple(canon_r))
    return sorted(out)


def main():
    out_dir, sf_dir = Path(sys.argv[1]), Path(sys.argv[2])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    dir_names = {p.name for p in out_dir.iterdir() if p.is_dir()}
    # a query that THREW during Verify leaves no output dir — that must
    # be a FAIL, not a silent omission; the manifest covers rows-only
    # queries that have no oracle entry
    manifest = out_dir / "queries.json"
    expected = set(json.loads(manifest.read_text())) if manifest.exists() \
        else set(oracle)
    for missing in sorted(expected - dir_names):
        print(f"FAIL {missing}: no output written (query threw in Verify)")
        n_fail += 1
    names = sorted(dir_names)
    for name in names:
        got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        got_cols = [c.lower() for c in got_rel.columns]
        got = got_rel.fetchall()
        if name not in oracle:
            # rows-only contract (SparkEntry): result must be non-empty
            if got:
                print(f"ROWS-ONLY {name}: rows={len(got)} PASS")
                n_pass += 1
            else:
                print(f"FAIL {name}: rows-only query returned 0 rows")
                n_fail += 1
            continue
        try:
            exp_rel = con.sql(oracle[name])
            exp_cols = [c.lower() for c in exp_rel.columns]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing
        gidx = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        eidx = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        g = canon([[r[i] for i in gidx] for r in got])
        e = canon([[r[i] for i in eidx] for r in exp])
        if len(g) != len(e):
            print(f"FAIL {name}: rowcount {len(g)} != {len(e)}")
            n_fail += 1
        elif g != e:
            bad = next(i for i, (a, b) in enumerate(zip(g, e)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad}:")
            print(f"  got: {g[bad]}")
            print(f"  exp: {e[bad]}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(g)}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(names)} total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
