# Prototype: q_embed_neardup oracle — embedding-cosine near-duplicate
# candidate PAIRS via the same LSH banding as q_embed_lsh_topk: pairs
# (id_a < id_b) sharing any capped bucket, exact cosine re-rank, global
# top-N by (cos desc, id_a, id_b). Python mirror vs DuckDB SQL must agree
# row-for-row before the SQL is wired into graft.queries.OracleSql.
import duckdb, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')")
M = (1 << 64) - 1

def plane_weight(p, j):
    z = (p * 131071 + j + 0x9e3779b97f4a7c15) & M
    z = ((z ^ (z >> 30)) * 0xbf58476d1ce4e5b9) & M
    z = ((z ^ (z >> 27)) * 0x94d049bb133111eb) & M
    z ^= (z >> 31)
    return (z >> 11) / float(1 << 52) - 1.0

BANDS, TARGET, CAP, TOPN, DIM = 4, 32, 256, 50, 64
MAXBITS_SQL = 24

def bits_for(n):
    m = (max(1, n) + TARGET - 1) // TARGET
    return min(24, max(4, (m - 1).bit_length()))

rows = con.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
vecs = {vid: [float(x) for x in emb] for vid, emb in rows}
n = len(vecs)
bits = bits_for(n)
planes = [[plane_weight(p, j) for j in range(DIM)] for p in range(BANDS * bits)]

def sig_of(emb, b):
    s = 0
    for p in range(bits):
        dot = 0.0
        pl = planes[b * bits + p]
        for j in range(DIM):
            dot += pl[j] * emb[j]
        if dot >= 0.0:
            s |= 1 << p
    return s

# ---- python mirror ----
from collections import defaultdict
buckets = defaultdict(list)
for vid, emb in vecs.items():
    for b in range(BANDS):
        buckets[(b, sig_of(emb, b))].append(vid)
pairs = set()
for (_, _), ids in buckets.items():
    if 2 <= len(ids) <= CAP:
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
import math
def cos(a, b):
    va, vb = vecs[a], vecs[b]
    dot = 0.0
    for j in range(DIM):
        dot += va[j] * vb[j]
    na = math.sqrt(sum(x * x for x in va))
    nb = math.sqrt(sum(x * x for x in vb))
    return dot / (na * nb)
scored = sorted(((cos(a, b), a, b) for a, b in pairs),
                key=lambda t: (-t[0], t[1], t[2]))
py = [(a, b, r + 1, round(c * 1e6)) for r, (c, a, b) in enumerate(scored[:TOPN])]
print(f"n={n} bits={bits} buckets={len(buckets)} pairs={len(pairs)}")
print("cosine top/bottom of candidates:",
      [round(c, 4) for c, _, _ in scored[:3]],
      [round(c, 4) for c, _, _ in scored[-3:]] if scored else [])

# ---- DuckDB SQL (the oracle candidate) ----
pl_max = [[plane_weight(p, j) for j in range(DIM)] for p in range(BANDS * MAXBITS_SQL)]
pl_vals = ", ".join(
    f"({idx}, [{', '.join(repr(v) for v in pl_max[idx])}])"
    for idx in range(BANDS * MAXBITS_SQL))
sql = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
nn AS (SELECT CAST(LEAST(24, GREATEST(4, CASE WHEN m <= 1 THEN 0
         ELSE length(bin(m - 1)) END)) AS INT) AS bits
       FROM (SELECT (GREATEST(1, count(*)) + {TARGET} - 1) // {TARGET} AS m FROM e) t),
planes(idx, pl) AS (VALUES {pl_vals}),
dots AS (
  SELECT vec_id, idx // bits AS b, idx % bits AS p,
    list_sum(list_transform(range(1, {DIM + 1}), j -> pl[j] * emb[j])) AS dot
  FROM e, nn, planes WHERE idx < {BANDS} * bits),
sig AS (
  SELECT vec_id, b,
    CAST(sum(CASE WHEN dot >= 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS s
  FROM dots GROUP BY 1, 2),
ok AS (SELECT b, s FROM sig GROUP BY b, s
       HAVING count(*) >= 2 AND count(*) <= {CAP}),
inb AS (SELECT vec_id, b, s FROM sig JOIN ok USING (b, s)),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM inb x JOIN inb y USING (b, s) WHERE x.vec_id < y.vec_id),
nrm AS (SELECT vec_id, emb,
          sqrt(list_sum(list_transform(emb, x -> x * x))) AS nm FROM e),
scored AS (
  SELECT id_a, id_b,
    list_sum(list_transform(range(1, {DIM + 1}), j -> a.emb[j] * b2.emb[j]))
      / (a.nm * b2.nm) AS cos
  FROM cand JOIN nrm a ON a.vec_id = id_a
  JOIN nrm b2 ON b2.vec_id = id_b),
r AS (SELECT id_a, id_b,
        CAST(row_number() OVER (ORDER BY cos DESC, id_a, id_b) AS BIGINT) AS rnk,
        cos
      FROM scored)
SELECT id_a, id_b, rnk, CAST(round(cos * 1000000) AS BIGINT) AS cos_r6
FROM r WHERE rnk <= {TOPN} ORDER BY rnk
"""
db = con.execute(sql).fetchall()
print(f"duckdb rows={len(db)} python rows={len(py)}")
mism = [i for i, (a, b) in enumerate(zip(py, db)) if tuple(a) != tuple(b)]
if mism:
    i = mism[0]
    print("MISMATCH at", i, "py=", py[i], "db=", db[i])
    sys.exit(1)
print("PROTO PASS: python mirror == duckdb oracle")
