#!/usr/bin/env python3
"""Build a 10x stress replica of an sf fixture directory.

Usage: python3 tools/make_stress.py [src_dir] [out_dir] [factor]

Replication scheme (keeps every invariant the catalog relies on):
  - dims (region, nation, supplier, part, customer) copy through 1x;
  - orders/lineitem replicate with o_orderkey/l_orderkey shifted per copy
    (joins stay consistent; (shipdate, orderkey, linenumber, price)
    stays unique);
  - events replicate with event_id shifted (user_id/ts unchanged ->
    10x per-key load, as-of/session tie-breaks stay deterministic);
  - documents replicate with doc_id shifted and the LAST word replaced
    per copy (9 near-identical clones per doc -> worst case for the
    near-dup family; n_chars recomputed);
  - embeddings replicate with vec_id shifted, vectors identical
    (exact-duplicate worst case for cosine dedup; IVF centroids stay
    the original vec_id < 8 rows).

Dev tool (driver-side python, like check.py) - not part of the library.
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10x"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10

SHIFT = 1_000_000_000  # far above any fixture key

con = duckdb.connect()
import os
os.makedirs(OUT, exist_ok=True)

def copy_through(name):
    con.execute(f"""
        COPY (SELECT * FROM '{SRC}/{name}.parquet')
        TO '{OUT}/{name}.parquet' (FORMAT PARQUET)""")

def replicate(name, sql):
    selects = " UNION ALL ".join(
        sql.format(i=i, shift=i * SHIFT) for i in range(FACTOR))
    con.execute(f"""
        COPY ({selects}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)""")

for t in ["region", "nation", "supplier", "part", "customer"]:
    copy_through(t)

replicate("orders", f"""
    SELECT o_orderkey + {{shift}} AS o_orderkey,
           o_custkey, o_orderstatus, o_totalprice, o_orderdate,
           o_orderpriority
    FROM '{SRC}/orders.parquet'""")

replicate("lineitem", f"""
    SELECT l_orderkey + {{shift}} AS l_orderkey,
           l_partkey, l_suppkey, l_linenumber, l_quantity,
           l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
           l_shipdate
    FROM '{SRC}/lineitem.parquet'""")

replicate("events", f"""
    SELECT event_id + {{shift}} AS event_id, ts, user_id, event_type,
           value, props
    FROM '{SRC}/events.parquet'""")

replicate("documents", f"""
    SELECT doc_id + {{shift}} AS doc_id,
           CASE WHEN {{i}} = 0 THEN text
                ELSE regexp_replace(text, '\\S+$', 'copy{{i}}') END AS text,
           lang, source,
           CAST(len(CASE WHEN {{i}} = 0 THEN text
                ELSE regexp_replace(text, '\\S+$', 'copy{{i}}') END)
             AS BIGINT) AS n_chars
    FROM '{SRC}/documents.parquet'""")

replicate("embeddings", f"""
    SELECT vec_id + {{shift}} AS vec_id, embedding, label
    FROM '{SRC}/embeddings.parquet'""")

for t in ["orders", "lineitem", "events", "documents", "embeddings"]:
    n = con.execute(f"SELECT COUNT(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
print(f"stress fixture at {OUT} (factor {FACTOR})")
