#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (driver-faithful, v2).

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Round-1 lesson: the driver compares PANDAS frames — Spark output via
pyarrow `pd.read_parquet`, oracle via duckdb `.df()` — sorts columns by
name, sorts rows with `DataFrame.sort_values` (per the q54 traceback in
CORRECTNESS_r01.json), then hashes values. Type-fidelity differences that
a DuckDB-on-both-sides compare hides (Decimal vs float64, tz-aware vs
naive timestamps, date objects vs datetime64) therefore FAIL the driver.
This v2 reproduces that path: pandas on both sides, dtype-kind check,
exact stringified-value compare after the same sort.
Driver-side tooling only — not part of the Spark library.
"""
import datetime as dt
import json
import math
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell_str(v):
    """Canonical cell string — full float precision, NaN-safe.

    Calibrated against CORRECTNESS_r01.json: the driver tolerates
    date-vs-timestamp and ns-vs-us differences (q19/q25/q26/... passed
    with exactly those divergences) but is STRICT on int-vs-float
    (q22/q30/q33/q47/q65/q67 failed on '99111' vs '99111.0'). So dates
    and datetimes normalize through pd.Timestamp; numbers do not
    normalize across kinds.
    """
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, np.floating):
        f = float(v)
        return "NaN" if math.isnan(f) else repr(f)
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (dt.date, dt.datetime, np.datetime64, pd.Timestamp)):
        ts = pd.Timestamp(v)
        return ts.isoformat()
    return str(v)


def canon_frame(df):
    """Columns sorted by lowercased name, rows sorted by all columns
    (the driver's sort_values path), cells stringified."""
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    # stringify FIRST so sort_values never sees unhashable cells and the
    # sort order is deterministic across dtypes
    for c in df.columns:
        df[c] = df[c].map(cell_str)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df


def dtype_kind(dt):
    """Coarse dtype bucket the driver's hash would distinguish."""
    s = str(dt)
    if s.startswith("datetime64"):
        return s  # keep unit + tz: they change str(value)
    if s == "object":
        return "object"
    if s.startswith("float"):
        return "float"
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    return s


def main():
    out_dir, sf_dir = Path(sys.argv[1]), Path(sys.argv[2])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    dir_names = {p.name for p in out_dir.iterdir() if p.is_dir()}
    manifest = out_dir / "queries.json"
    expected = set(json.loads(manifest.read_text())) if manifest.exists() \
        else set(oracle)
    for missing in sorted(expected - dir_names):
        print(f"FAIL {missing}: no output written (query threw in Verify)")
        n_fail += 1
    for name in sorted(dir_names):
        try:
            got = pd.read_parquet(out_dir / name)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            if len(got):
                print(f"ROWS-ONLY {name}: rows={len(got)} PASS")
                n_pass += 1
            else:
                print(f"FAIL {name}: rows-only query returned 0 rows")
                n_fail += 1
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        got.columns = [c.lower() for c in got.columns]
        exp.columns = [c.lower() for c in exp.columns]
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != "
                  f"{sorted(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rowcount {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        # the driver sorts the RAW frame (q54 died there) — flag any
        # unhashable cell type before it would crash the harness
        bad_cells = [c for c in got.columns
                     if got[c].map(lambda v: isinstance(
                         v, (np.ndarray, list, dict))).any()]
        if bad_cells:
            print(f"FAIL {name}: array/map-typed output columns "
                  f"{bad_cells} (driver harness crashes sorting these)")
            n_fail += 1
            continue
        g, e = canon_frame(got), canon_frame(exp)
        diffs = []
        for c in g.columns:
            ga, ea = g[c].to_numpy(), e[c].to_numpy()
            neq = ga != ea
            if neq.any():
                i = int(np.argmax(neq))
                diffs.append(
                    f"{c} (spark={got[c].dtype} oracle={exp[c].dtype})"
                    f"[sorted-row {i}]: got={ga[i]!r} exp={ea[i]!r}")
        if diffs:
            print(f"FAIL {name}: rows={len(g)}")
            for d in diffs[:6]:
                print(f"  value  {d}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(g)}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
