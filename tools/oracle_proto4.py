# Prototype: q_embed_lsh_topk / q_embed_lsh_buckets oracles. The seeded
# hyperplane weights are deterministic CONSTANTS — mirrored here exactly as
# graft.queries.EmbedQueries.planeWeight computes them, then embedded as
# double literals in the SQL (shortest round-trip repr == same IEEE value).
import duckdb, sys, math

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')")
M = (1 << 64) - 1

def s64(v):  # interpret 64-bit pattern as signed
    return v - (1 << 64) if v >= (1 << 63) else v

def plane_weight(p, j):
    z = (p * 131071 + j + 0x9e3779b97f4a7c15) & M
    z = ((z ^ (z >> 30)) * 0xbf58476d1ce4e5b9) & M
    z = ((z ^ (z >> 27)) * 0x94d049bb133111eb) & M
    z ^= (z >> 31)
    return (z >> 11) / float(1 << 52) - 1.0

BANDS, TARGET, CAPMUL, K, NQ, DIM = 4, 32, 8, 5, 10, 64
MAXBITS_SQL = 12  # literal planes generated up to this many bits per band

def bits_for(n):
    m = (max(1, n) + TARGET - 1) // TARGET
    return min(24, max(4, (m - 1).bit_length()))

rows = con.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
vecs = {vid: [float(x) for x in emb] for vid, emb in rows}
n = len(vecs)
bits = bits_for(n)
assert bits <= MAXBITS_SQL
planes = [[plane_weight(p, j) for j in range(DIM)] for p in range(BANDS * bits)]

def sig_of(emb, b):
    s = 0
    for p in range(bits):
        dot = 0.0
        pl = planes[b * bits + p]
        for j in range(DIM):
            dot += pl[j] * emb[j]
        if dot >= 0:
            s |= 1 << p
    return s

from collections import defaultdict
buckets = defaultdict(list)
for vid, emb in vecs.items():
    for b in range(BANDS):
        buckets[(b, sig_of(emb, b))].append(vid)

# ---- expected lshBuckets histogram ----
hist = defaultdict(int)
for (b, s), ds in buckets.items():
    hist[(b, len(ds))] += 1
exp_hist = [(b, sz, c) for (b, sz), c in hist.items()]

# ---- expected lshTopK ----
ok = {k: v for k, v in buckets.items() if 2 <= len(v) <= CAPMUL * TARGET}
cand = set()
for (b, s), ds in ok.items():
    qs = [d for d in ds if d < NQ]
    for q in qs:
        for c in ds:
            if c != q:
                cand.add((q, c))
norms = {}
for vid, v in vecs.items():
    acc = 0.0
    for x in v:
        acc += x * x
    norms[vid] = math.sqrt(acc)
percand = defaultdict(list)
for q, c in cand:
    dot = 0.0
    for x, y in zip(vecs[q], vecs[c]):
        dot += x * y
    percand[q].append((dot / (norms[q] * norms[c]), c))
import decimal
exp_topk = []
for q in sorted(percand):
    lst = sorted(percand[q], key=lambda t: (-t[0], t[1]))[:K]
    for rnk, (cs, c) in enumerate(lst, 1):
        r6 = int(decimal.Decimal(cs * 1e6).quantize(0, rounding=decimal.ROUND_HALF_UP))
        exp_topk.append((q, c, rnk, r6))

# ---- SQL ----
pl_max = [[plane_weight(p, j) for j in range(DIM)] for p in range(BANDS * MAXBITS_SQL)]
pl_vals = ", ".join(
    f"({i}, [" + ", ".join(repr(x) for x in row) + "])"
    for i, row in enumerate(pl_max))

common = f"""
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
  FROM dots GROUP BY 1, 2)
"""

sql_hist = common + """
SELECT b AS band, cnt AS bucket_size, count(*) AS n_buckets FROM (
  SELECT b, s, count(*) AS cnt FROM sig GROUP BY b, s) t
GROUP BY 1, 2 ORDER BY 1, 2"""
got_hist = con.execute(sql_hist).fetchall()
okh = sorted(got_hist) == sorted(exp_hist)
print("q_embed_lsh_buckets:", "PASS" if okh else "FAIL",
      len(got_hist), "vs", len(exp_hist))
if not okh:
    print(" exp:", sorted(exp_hist)[:5])
    print(" got:", sorted(got_hist)[:5])

sql_topk = common + f""",
ok AS (SELECT b, s FROM sig GROUP BY b, s
       HAVING count(*) >= 2 AND count(*) <= {CAPMUL * TARGET}),
inb AS (SELECT vec_id, b, s FROM sig JOIN ok USING (b, s)),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM inb q JOIN inb c USING (b, s)
  WHERE q.vec_id < {NQ} AND c.vec_id != q.vec_id),
nrm AS (SELECT vec_id, emb, sqrt(list_sum(list_transform(emb, x -> x * x))) AS nm FROM e),
scored AS (
  SELECT query_id, neighbor_id,
    list_sum(list_transform(range(1, {DIM + 1}), j -> a.emb[j] * b2.emb[j]))
      / (a.nm * b2.nm) AS cos
  FROM cand JOIN nrm a ON a.vec_id = query_id JOIN nrm b2 ON b2.vec_id = neighbor_id),
r AS (SELECT query_id, neighbor_id,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk, cos
      FROM scored)
SELECT query_id, neighbor_id, rnk, CAST(round(cos * 1000000) AS BIGINT) AS cos_r6
FROM r WHERE rnk <= {K} ORDER BY query_id, rnk"""
got_topk = con.execute(sql_topk).fetchall()
okt = sorted(got_topk) == sorted(exp_topk)
print("q_embed_lsh_topk:", "PASS" if okt else "FAIL",
      len(got_topk), "vs", len(exp_topk))
if not okt:
    print(" exp:", sorted(set(exp_topk) - set(got_topk))[:4])
    print(" got:", sorted(set(got_topk) - set(exp_topk))[:4])
print("sql_topk len:", len(sql_topk))
