# Prototype part 2: q_simhash (polynomial token hash + murmur fmix64 in
# HUGEINT arithmetic) and q_embed_topk (cosine top-k vs list arithmetic).
import duckdb, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
M = (1 << 64) - 1

def check(name, expected, sql):
    got = con.execute(sql).fetchall()
    e, g = sorted(expected), sorted(got)
    ok = e == g
    print(f"{name}: {'PASS' if ok else 'FAIL'} ({len(e)} vs {len(g)} rows)")
    if not ok:
        eset, gset = set(e), set(g)
        print("  only-expected:", sorted(eset - gset)[:4])
        print("  only-sql     :", sorted(gset - eset)[:4])
    return ok

# ---------------- q_simhash ----------------
def fmix64(z):
    z = ((z ^ (z >> 33)) * 0xff51afd7ed558ccd) & M
    z = ((z ^ (z >> 33)) * 0xc4ceb9fe1a85ec53) & M
    return z ^ (z >> 33)

def simhash(text):
    counts = [0] * 64
    for tok in text.split(" "):
        if not tok:
            continue
        h = 1125899906842597
        for ch in tok:
            h = (31 * h + ord(ch)) & M
        h = fmix64(h)
        for b in range(64):
            counts[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if counts[b] > 0:
            out |= 1 << b
    return out

docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
exp = [(doc_id, format(simhash(text), "016x")) for doc_id, text in docs]

# SQL helpers via DuckDB macros: 64-bit wrapping semantics in HUGEINT.
con.execute("CREATE MACRO m64(x) AS x % 18446744073709551616::HUGEINT")
# (a*c) mod 2^64 without exceeding HUGEINT range: split a into 32-bit halves
con.execute("""CREATE MACRO mulmod64(a, c) AS
  m64((a % 4294967296::HUGEINT) * c
      + (((a // 4294967296::HUGEINT) * c) % 4294967296::HUGEINT)
        * 4294967296::HUGEINT)""")
con.execute("""CREATE MACRO xor64(a, b) AS
  CAST(xor(CAST(a // 4294967296::HUGEINT AS BIGINT),
           CAST(b // 4294967296::HUGEINT AS BIGINT)) AS HUGEINT)
    * 4294967296::HUGEINT
  + CAST(xor(CAST(a % 4294967296::HUGEINT AS BIGINT),
             CAST(b % 4294967296::HUGEINT AS BIGINT)) AS HUGEINT)""")
con.execute("CREATE MACRO shr33(a) AS a // 8589934592::HUGEINT")
con.execute("""CREATE MACRO fmix64(z0) AS (
  WITH s1 AS (SELECT mulmod64(xor64(z0, shr33(z0)),
                18397679294719823053::HUGEINT) AS z),
       s2 AS (SELECT mulmod64(xor64(z, shr33(z)),
                14181476777654086739::HUGEINT) AS z FROM s1)
  SELECT xor64(z, shr33(z)) FROM s2)""")

sql = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != '')) AS tok
  FROM documents),
th AS (
  SELECT doc_id,
    fmix64(list_reduce(
      list_concat([1125899906842597::HUGEINT],
        list_transform(range(1, len(tok) + 1),
          i -> CAST(ascii(tok[i:i]) AS HUGEINT))),
      (acc, x) -> m64(31 * acc + x))) AS h
  FROM tok),
bits AS (
  SELECT doc_id, b,
    sum(CASE WHEN CAST(h // (2::HUGEINT ** b.b) % 2 AS INT) = 1
        THEN 1 ELSE -1 END) AS vote
  FROM th, range(0, 64) AS b(b) GROUP BY doc_id, b),
vals AS (
  SELECT d.doc_id,
    coalesce(sum(CASE WHEN vote > 0 THEN 2::HUGEINT ** b ELSE 0::HUGEINT END), 0::HUGEINT) AS v
  FROM (SELECT DISTINCT doc_id FROM documents) d
  LEFT JOIN bits USING (doc_id) GROUP BY d.doc_id)
SELECT doc_id,
  printf('%08x%08x',
    CAST(v // 4294967296::HUGEINT AS BIGINT),
    CAST(v % 4294967296::HUGEINT AS BIGINT)) AS simhash_hex
FROM vals ORDER BY doc_id
"""
check("q_simhash", exp, sql)

# ---------------- q_embed_topk ----------------
import math
embs = con.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
vecs = {vid: [float(x) for x in emb] for vid, emb in embs}
norms = {}
for vid, v in vecs.items():
    s = 0.0
    for x in v:
        s += x * x
    norms[vid] = math.sqrt(s)
exp = []
for q in sorted(vecs):
    if q >= 10:
        break
    scored = []
    for c in vecs:
        if c == q:
            continue
        dot = 0.0
        for x, y in zip(vecs[q], vecs[c]):
            dot += x * y
        scored.append((dot / (norms[q] * norms[c]), c))
    scored.sort(key=lambda t: (-t[0], t[1]))
    for rnk, (cs, c) in enumerate(scored[:5], 1):
        # Java BigDecimal HALF_UP == round away from zero on ties
        import decimal
        r6 = int(decimal.Decimal(cs * 1e6).quantize(0, rounding=decimal.ROUND_HALF_UP))
        exp.append((q, c, rnk, r6))
check("q_embed_topk", exp, """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
n AS (SELECT vec_id, emb,
        sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm FROM e),
p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        list_sum(list_transform(range(1, 65), i -> q.emb[i] * c.emb[i]))
          / (q.nrm * c.nrm) AS cos
      FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id != q.vec_id),
r AS (SELECT query_id, neighbor_id,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk, cos
      FROM p)
SELECT query_id, neighbor_id, rnk, CAST(round(cos * 1000000) AS BIGINT) AS cos_r6
FROM r WHERE rnk <= 5 ORDER BY query_id, rnk
""")
