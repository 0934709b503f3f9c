# Prototype: q_neardup_clusters oracle — connected components over the
# thresholded near-duplicate pair graph (same LSH banding + capped-bucket
# candidate pairs as q_embed_neardup, exact cosine >= TAU), labels = min
# vec_id reachable. Python mirror (union-find) vs a DuckDB RECURSIVE CTE
# (reachability closure) must agree row-for-row before the SQL is wired
# into graft.queries.OracleSql.
import duckdb, math, sys

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

BANDS, TARGET, CAP, DIM = 4, 32, 256, 64
MAXBITS_SQL = 24
TAU = 0.40

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

def cos(a, b):
    va, vb = vecs[a], vecs[b]
    dot = 0.0
    for j in range(DIM):
        dot += va[j] * vb[j]
    na = math.sqrt(sum(x * x for x in va))
    nb = math.sqrt(sum(x * x for x in vb))
    if na * nb == 0:
        return -1.0
    return dot / (na * nb)

edges = [(a, b) for a, b in pairs if cos(a, b) >= TAU]
print(f"n={n} bits={bits} candidate pairs={len(pairs)} edges(cos>={TAU})={len(edges)}")

# ---- python mirror: union-find ----
parent = {}
def find(x):
    while parent.get(x, x) != x:
        parent[x] = parent.get(parent[x], parent[x])
        x = parent[x]
    return x
def union(a, b):
    ra, rb = find(a), find(b)
    if ra != rb:
        parent[max(ra, rb)] = min(ra, rb)
for a, b in edges:
    parent.setdefault(a, a); parent.setdefault(b, b)
    union(a, b)
clusters = defaultdict(list)
for v in parent:
    clusters[find(v)].append(v)
py = sorted((cid, len(ms), sum(ms)) for cid, ms in clusters.items())
print(f"python clusters={len(py)} sizes={sorted((s for _, s, _ in py), reverse=True)[:8]}")

# ---- DuckDB SQL (the oracle candidate) ----
pl_max = [[plane_weight(p, j) for j in range(DIM)] for p in range(BANDS * MAXBITS_SQL)]
pl_vals = ", ".join(
    f"({idx}, [{', '.join(repr(v) for v in pl_max[idx])}])"
    for idx in range(BANDS * MAXBITS_SQL))
sql = f"""
WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
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
prs AS (
  SELECT id_a, id_b FROM cand
  JOIN nrm a ON a.vec_id = id_a JOIN nrm b2 ON b2.vec_id = id_b
  WHERE CASE WHEN a.nm * b2.nm = 0 THEN -1 ELSE
    list_sum(list_transform(range(1, {DIM + 1}), j -> a.emb[j] * b2.emb[j]))
      / (a.nm * b2.nm) END >= {TAU}),
verts AS (SELECT DISTINCT v FROM
  (SELECT id_a AS v FROM prs UNION ALL SELECT id_b FROM prs)),
edg AS (SELECT id_a AS src, id_b AS dst FROM prs
        UNION ALL SELECT id_b, id_a FROM prs),
reach(v, u) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.v, e2.dst FROM reach r JOIN edg e2 ON e2.src = r.u)
SELECT CAST(min(u) AS BIGINT) AS cluster_id, CAST(count(*) AS BIGINT) AS csize,
  CAST(sum(v) AS BIGINT) AS member_sum
FROM (SELECT v, min(u) AS u FROM reach GROUP BY v) labels
GROUP BY (SELECT min(u2.u) FROM (SELECT v AS vv, min(u) AS u FROM reach GROUP BY v) u2
          WHERE u2.u = labels.u)
ORDER BY 1
"""
# simpler grouping: label IS min reachable vertex, so group directly by it
sql = sql.replace(
    """SELECT CAST(min(u) AS BIGINT) AS cluster_id, CAST(count(*) AS BIGINT) AS csize,
  CAST(sum(v) AS BIGINT) AS member_sum
FROM (SELECT v, min(u) AS u FROM reach GROUP BY v) labels
GROUP BY (SELECT min(u2.u) FROM (SELECT v AS vv, min(u) AS u FROM reach GROUP BY v) u2
          WHERE u2.u = labels.u)
ORDER BY 1""",
    """SELECT CAST(u AS BIGINT) AS cluster_id, CAST(count(*) AS BIGINT) AS csize,
  CAST(sum(v) AS BIGINT) AS member_sum
FROM (SELECT v, min(u) AS u FROM reach GROUP BY v) labels
GROUP BY u ORDER BY 1""")
db = con.execute(sql).fetchall()
db = [(int(a), int(b), int(c)) for a, b, c in db]
print(f"duckdb clusters={len(db)}")
if db == py:
    print("PROTO PASS: python union-find == duckdb recursive closure")
else:
    print("PROTO FAIL")
    print("py[:5] =", py[:5])
    print("db[:5] =", db[:5])
    sys.exit(1)
