#!/usr/bin/env python3
"""DuckDB side of the cross-engine parity probe (see ProbeParity.scala)."""
import duckdb

DOCS = [
    "The quick brown fox, jumps! Over 2 lazy dogs.",
    "  leading and trailing  ",
    "punct... only!!!",
    "Der schnelle braune Fuchs springt über den faulen Hund",
    "你好世界 this has cjk 汉字",
    "a",
    "",
]

con = duckdb.connect()
con.execute("CREATE TABLE docs(text VARCHAR)")
for d in DOCS:
    con.execute("INSERT INTO docs VALUES (?)", [d])

TOK = r"[^a-z0-9\x{4e00}-\x{9fff}]+"
sql = f"""
SELECT text,
  CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h60,
  list_filter(string_split_regex(lower(text), '{TOK}'),
              t -> len(t) > 0) AS toks,
  len(string_split_regex(lower(text), '{TOK}')) AS n_toks_raw,
  len(list_filter(string_split_regex(lower(text), '{TOK}'),
      t -> len(t) > 0)) AS n_toks,
  len(regexp_extract_all(text, '[0-9]')) AS n_digit,
  len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
  len(regexp_extract_all(lower(text), '\\b(the|and|of|to|in|is|a)\\b'))
    AS n_stop_en,
  len(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]')) AS n_cjk,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(
        list_filter(string_split_regex(lower(text), '{TOK}'),
                    t -> len(t) > 0),
        tok -> CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT)
               % 2147483647)),
    (acc, h) -> (acc * 31 + h) % 2147483647) AS fold_hash
FROM docs
"""
for row in con.sql(sql).fetchall():
    print("PROBE\t" + "\t".join(str(v).replace("\t", " ") for v in row))

# negative-operand integer-division parity: DuckDB's // must truncate
# toward zero like Spark's DIV (both engines, -7/2 -> -3). The q264/q267
# seasonal tails divide potentially-negative integer sums with bare
# DIV-vs-//; a DuckDB upgrade that switched // to flooring would break
# exactly those queries, so pin the semantic here.
NEG = con.sql(
    "SELECT -7 // 2, 7 // -2, -7 // -2, -1 // 3, 1 // -3").fetchone()
print("PROBE_NEG_INTDIV\t" + "\t".join(str(v) for v in NEG))
assert NEG == (-3, -3, 3, 0, 0), (
    f"DuckDB // no longer truncates toward zero: {NEG} — "
    "q264/q267 (and any bare DIV-vs-// oracle) are now at risk")
