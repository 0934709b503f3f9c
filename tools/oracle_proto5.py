# Prototype part 5: q_embed_ivf_topk — an independent Python mirror of the
# Spark IVF pipeline (EmbedQueries.ivfTopK: integer-bit-length cell count,
# fixed-order double cosine, argmax assignment with smaller-cell ties,
# top-IvfProbe probes, 8x-expected cell cap, exact re-rank) compared
# against the committed DuckDB oracle SQL (OracleSql.embedIvfTopK).
import duckdb, math, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
NQ, PROBE, K = 10, 4, 5

con = duckdb.connect()
con.execute(
    f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')")
rows = con.execute(
    "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
vecs = {int(i): [float(x) for x in emb] for i, emb in rows}  # float32 -> double
n = len(vecs)

# cells = min(4096, max(8, 1 << (bitlen(n)//2))) — EmbedQueries.ivfCellsFor
cells = min(4096, max(8, 1 << (n.bit_length() // 2)))
cellcap = 8 * ((n + cells - 1) // cells)


def norm(v):
    s = 0.0
    for x in v:
        s += x * x
    return math.sqrt(s)


def cos(a, b, na, nb):
    # zero-norm guard mirrors EmbedQueries/OracleSql: 0/0 would be NaN,
    # which the JVM argmax and DuckDB's ORDER BY rank differently
    if na * nb == 0:
        return -1.0
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s / (na * nb)


norms = {i: norm(v) for i, v in vecs.items()}
anchors = sorted(i for i in vecs if i < cells)

assigned, probes = {}, {}
for i, v in vecs.items():
    cs = [cos(v, vecs[a], norms[i], norms[a]) for a in anchors]
    best = 0
    for j in range(1, len(cs)):  # strict >, ascending: ties -> smaller cell
        if cs[j] > cs[best]:
            best = j
    assigned[i] = anchors[best]
    if i < NQ:
        order = sorted(range(len(cs)), key=lambda j: (-cs[j], anchors[j]))
        probes[i] = [anchors[j] for j in order[:PROBE]]

sizes = {}
for i, c in assigned.items():
    sizes[c] = sizes.get(c, 0) + 1
ok_cells = {c for c, s in sizes.items() if s <= cellcap}

expected = []
for q, pcells in probes.items():
    cand = [i for i, c in assigned.items()
            if c in pcells and c in ok_cells and i != q]
    scored = sorted(
        ((cos(vecs[q], vecs[i], norms[q], norms[i]), i) for i in cand),
        key=lambda t: (-t[0], t[1]))
    for rnk, (cv, i) in enumerate(scored[:K], 1):
        expected.append((q, i, rnk, round(cv * 1000000)))

# the committed oracle SQL, verbatim shape (OracleSql.embedIvfTopK)
sql = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
n AS (SELECT vec_id, emb,
        sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm FROM e),
prm AS (SELECT LEAST(4096, GREATEST(8,
          1::BIGINT << (length(printf('%b', cnt)) // 2))) AS cells, cnt
        FROM (SELECT count(*) AS cnt FROM e)),
cap AS (SELECT 8 * ((cnt + cells - 1) // cells) AS cellcap FROM prm),
sc AS (SELECT v.vec_id, a.vec_id AS cell_id,
        CASE WHEN v.nrm * a.nrm = 0 THEN -1 ELSE
          list_sum(list_transform(range(1, 65), i -> v.emb[i] * a.emb[i]))
            / (v.nrm * a.nrm) END AS cos
       FROM n v, n a, prm WHERE a.vec_id < prm.cells),
rk AS (SELECT vec_id, cell_id, cos,
        row_number() OVER (PARTITION BY vec_id
          ORDER BY cos DESC, cell_id) AS r FROM sc),
assigned AS (SELECT vec_id AS neighbor_id, cell_id FROM rk WHERE r = 1),
ok AS (SELECT cell_id FROM assigned, cap
       GROUP BY cell_id, cap.cellcap HAVING count(*) <= cap.cellcap),
probes AS (SELECT vec_id AS query_id, cell_id FROM rk
           WHERE vec_id < {NQ} AND r <= {PROBE}),
cand AS (SELECT p.query_id, a.neighbor_id
         FROM probes p
         JOIN ok USING (cell_id)
         JOIN assigned a USING (cell_id)
         WHERE a.neighbor_id != p.query_id),
pairs AS (SELECT c.query_id, c.neighbor_id,
        list_sum(list_transform(range(1, 65), i -> q.emb[i] * nb.emb[i]))
          / (q.nrm * nb.nrm) AS cos
        FROM cand c
        JOIN n q ON q.vec_id = c.query_id
        JOIN n nb ON nb.vec_id = c.neighbor_id),
r2 AS (SELECT query_id, neighbor_id,
        CAST(row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk, cos
       FROM pairs)
SELECT query_id, neighbor_id, rnk,
  CAST(round(cos * 1000000) AS BIGINT) AS cos_r6
FROM r2 WHERE rnk <= {K} ORDER BY query_id, rnk"""

got = [(int(a), int(b), int(c), int(d)) for a, b, c, d in con.execute(sql).fetchall()]
exp = sorted(expected)
g = sorted(got)
ok = exp == g
print(f"q_embed_ivf_topk: {'PASS' if ok else 'FAIL'} "
      f"({len(exp)} rows, cells={cells}, cap={cellcap})")
if not ok:
    es, gs = set(exp), set(g)
    print("  only-mirror:", sorted(es - gs)[:4])
    print("  only-sql   :", sorted(gs - es)[:4])
sys.exit(0 if ok else 1)
