#!/usr/bin/env python3
"""Compare a local bench JSON line against BENCH_r02/BENCH_r03 artifacts.

Usage: python3 tools/bench_compare.py <new_bench.json>
Artifacts store the raw stdout tail (r2's is truncated mid-line), so
per-query times are regex-extracted and keys normalized to the qN prefix.
Driver-side tooling only — not part of the Spark library.
"""
import json
import re
import sys
from pathlib import Path

def norm(k, base=10):
    """Normalize any key generation to a bare decimal-number string:
    'q36_ngram' -> '36', 'q36' -> '36', '36' -> '36' (round-5 decimal
    keys), '10' -> '36' under base=36 (round-6 keys, declared by the
    artifact's "kb":36 field — base-36 keys can be digits-only, so the
    base is never sniffed from key shape). The historical 'q' PREFIX is
    stripped only in the decimal generation: base-36 keys carry no
    prefix, and 'q' is itself the base-36 digit for 26."""
    k = k.split("_")[0]
    if base == 10:
        k = re.sub(r"^q", "", k)
    return str(int(k, base))


new = json.loads(Path(sys.argv[1]).read_text())
kb = int(new.get("kb", 10))
nq = {norm(k, kb): v for k, v in new["queries"].items()}


def load(path):
    try:
        tail = json.loads(Path(path).read_text()).get("tail", "")
    except Exception:
        return {}
    return {norm(m.group(1)): float(m.group(2))
            for m in re.finditer(r'"(q?\d+[a-z_]*)":(-?[0-9.]+)', tail)}


r3 = load("BENCH_r03.json")
r2 = load("BENCH_r02.json")

print(f"total={new['value']}s  n={len(nq)}")
for ref, label in ((r3, "r3"), (r2, "r2")):
    common = [k for k in nq if k in ref and nq[k] >= 0 and ref[k] >= 0]
    if not common:
        print(f"vs {label}: no comparable queries")
        continue
    tn = sum(nq[k] for k in common)
    tr = sum(ref[k] for k in common)
    print(f"vs {label}: {len(common)} common, new={tn:.1f}s {label}={tr:.1f}s "
          f"ratio={tn / tr:.2f}")
    worst = sorted(common, key=lambda k: nq[k] - ref[k], reverse=True)[:8]
    for k in worst:
        print(f"  {k}: {ref[k]:.2f} -> {nq[k]:.2f}")
print("slowest now:",
      sorted(nq.items(), key=lambda x: -x[1])[:10])
for extra in ("ingest_rows_per_sec", "ingest_latency_ms", "lat_exp_ms",
              "lat_ms", "ingest_k", "lat", "z95"):
    if extra in new:
        print(extra, "=", new[extra])
if "rem" in new:
    print("rem =", {norm(k, kb): v for k, v in new["rem"].items()})
