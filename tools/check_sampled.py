#!/usr/bin/env python3
"""Sampled oracle check for the HEAVY tier (r8 verdict ask #4).

Usage: python3 tools/check_sampled.py <verify_out_dir> <sf_dir> <query> \
           <sample_table> <sample_key> <id_cols> <mod> <rem> [base]

e.g.  python3 tools/check_sampled.py /tmp/heavy_out /tmp/stress10x_sf01 \
           q219_prefix_simjoin documents doc_id id_a,id_b 41 7 1000000000

`base` (default: none) folds the id before sampling — the predicate is
(key % base) % mod == rem. On make_stress replicas, clone ids differ by
i*1e9, so a plain id sample can NEVER pick two different copies of one
original (i != j -> different residues): base=1e9 samples whole clone
FAMILIES, which is where the near-dup pairs live.

Why this exists: at 10x sf0.1 some oracles are single-node-infeasible —
q219's exact DuckDB similarity join was stopped at 75 CPU-minutes in
round 8, leaving the heavy tier silently weaker exactly where Spark's
distributed win is largest. This check keeps an INDEPENDENT heavy-tier
verdict: restrict the oracle's input table to a deterministic id-hash
sample (sample_key % mod == rem), run the full oracle on that slice,
and compare it row-by-row against the Spark output filtered to rows
whose id columns all fall in the sample.

SOUNDNESS CONTRACT (caller must check, documented per query): valid
only for queries whose output row for ids (a, b, ...) is a pure
function of THOSE input rows — i.e. pairwise-exact semantics. q219
qualifies: its prefix filter is lossless (SimJoinSpec), so a pair
appears with its exact (inter, n_a, n_b, jac) iff Jaccard >= t,
independent of every other document. Queries with corpus-global state
(df-caps, top-k, global totals) do NOT qualify.

Driver-side tooling only — not part of the Spark library.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent))
from check import TABLES, canon_frame  # noqa: E402


def main():
    out_dir, sf_dir = Path(sys.argv[1]), Path(sys.argv[2])
    query, sample_table, sample_key = sys.argv[3], sys.argv[4], sys.argv[5]
    id_cols = sys.argv[6].split(",")
    mod, rem = int(sys.argv[7]), int(sys.argv[8])
    base = int(sys.argv[9]) if len(sys.argv) > 9 else None
    def key_sql(col):
        return f"({col} % {base}) % {mod}" if base else f"{col} % {mod}"
    def key_py(s_):
        return (s_ % base) % mod if base else s_ % mod

    oracle = json.loads((out_dir / "oracle_sql.json").read_text())[query]
    con = duckdb.connect()
    for t in TABLES:
        pred = (f" WHERE {key_sql(sample_key)} = {rem}"
                if t == sample_table else "")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'{pred}")
    exp = con.sql(oracle).df()

    got = pd.read_parquet(out_dir / query)
    for c in id_cols:
        got = got[key_py(got[c]) == rem]
    got = got.reset_index(drop=True)

    got.columns = [c.lower() for c in got.columns]
    exp.columns = [c.lower() for c in exp.columns]
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL {query}: columns {sorted(got.columns)} != "
              f"{sorted(exp.columns)}")
        sys.exit(1)
    if len(got) != len(exp):
        print(f"FAIL {query}: sampled rowcount {len(got)} != {len(exp)}")
        sys.exit(1)
    g, e = canon_frame(got), canon_frame(exp)
    for c in g.columns:
        ga, ea = g[c].to_numpy(), e[c].to_numpy()
        neq = ga != ea
        if neq.any():
            import numpy as np
            i = int(np.argmax(neq))
            print(f"FAIL {query}: col {c}[sorted-row {i}]: "
                  f"got={ga[i]!r} exp={ea[i]!r}")
            sys.exit(1)
    tag = f"({sample_key}%{base})%{mod}" if base else f"{sample_key}%{mod}"
    print(f"PASS {query} (sampled {tag}=={rem}): "
          f"rows={len(g)} verified exactly")
    sys.exit(0)


if __name__ == "__main__":
    main()
