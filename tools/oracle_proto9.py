#!/usr/bin/env python3
"""Prototype for the q_encode_blocks oracle (round 5).

The query encodes docsAsStrings with EncodeConfig(numPartitions=1,
blockRows=64): one partition, so blocks per column = ceil(N/64) exactly
(the 32 MB blockBytes early-cut can't trigger at 64 rows of documents),
rows = N, raw_bytes = sum of UTF-8 byte lengths per column (BlockCodec
counts value bytes; nulls contribute 0 and docsAsStrings has none).

Mirror those three facts in python from the parquet table and check the
DuckDB SQL reproduces them.
"""
import sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

con = duckdb.connect()
con.execute(
    f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")

rows = con.execute("SELECT doc_id, text, lang, source FROM documents").fetchall()
N = len(rows)
exp = []
for name, idx, conv in (("doc_id_s", 0, lambda v: str(v)), ("lang", 2, str),
                        ("source", 3, str), ("text", 1, str)):
    raw = sum(len(conv(r[idx]).encode("utf-8")) for r in rows)
    exp.append((name, (N + 63) // 64, N, raw))
exp.sort()

SQL = """
WITH vals AS (
  SELECT 'doc_id_s' AS col_name, CAST(doc_id AS VARCHAR) AS v FROM documents
  UNION ALL SELECT 'text', text FROM documents
  UNION ALL SELECT 'lang', lang FROM documents
  UNION ALL SELECT 'source', source FROM documents)
SELECT col_name,
  (count(*) + 63) // 64 AS n_blocks,
  count(*) AS n_rows,
  CAST(sum(strlen(v)) AS BIGINT) AS raw_bytes
FROM vals GROUP BY col_name ORDER BY col_name
"""
got = con.execute(SQL).fetchall()
ok = True
for e, g in zip(exp, got):
    m = tuple(e) == tuple(g)
    ok = ok and m
    print(("OK  " if m else "FAIL"), e, "sql=", g)
print("PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
