# Prototype: q_minhash_lsh oracle. Python mirrors the planned Spark
# pipeline (seedhash64 minhash, arrayhash64 band buckets, cap, candidate
# pairs, integer match counts); DuckDB SQL must reproduce it exactly.
import duckdb, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
M = (1 << 64) - 1
GOLDEN = 0x9e3779b97f4a7c15
POLYSEED = 1125899906842597
NUMH, BANDS, RPB, CAP = 32, 8, 4, 200

def fmix64(z):
    z = ((z ^ (z >> 33)) * 0xff51afd7ed558ccd) & M
    z = ((z ^ (z >> 33)) * 0xc4ceb9fe1a85ec53) & M
    return z ^ (z >> 33)

def poly(s):
    h = POLYSEED
    for ch in s:
        h = (31 * h + ord(ch)) & M
    return h

SEEDC = [fmix64((k * GOLDEN) & M) for k in range(NUMH)]

def hash_seed(s, k):
    return fmix64(poly(s) ^ SEEDC[k])

def signed(v):
    return v - (1 << 64) if v >= (1 << 63) else v

def unsigned(v):
    return v + (1 << 64) if v < 0 else v

def bandhash(vals):  # vals: signed longs
    h = POLYSEED
    for v in vals:
        h = (31 * h + unsigned(v)) & M
    return fmix64(h)

docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
sh = {}
for doc_id, text in docs:
    toks = text.split(" ")
    s = ({" ".join(toks[i:i+3]) for i in range(len(toks) - 2)}
         if len(toks) >= 3 else {" ".join(toks)})
    sh[doc_id] = s

sig = {}
for d, s in sh.items():
    sig[d] = [min(signed(hash_seed(x, k)) for x in s) for k in range(NUMH)]

from collections import defaultdict
buckets = defaultdict(list)
for d, mh in sig.items():
    for b in range(BANDS):
        buckets[(b, bandhash(mh[b*RPB:(b+1)*RPB]))].append(d)
cand = set()
for (b, bh), ds in buckets.items():
    if 2 <= len(ds) <= CAP:
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i+1, len(ds)):
                cand.add((ds[i], ds[j]))
rows = []
for a, b in cand:
    m = sum(1 for x, y in zip(sig[a], sig[b]) if x == y)
    rows.append((a, b, m))
rows.sort(key=lambda r: (-r[2], r[0], r[1]))
exp = rows[:100]
print("python pairs:", len(cand), "out:", len(exp))

# ---- DuckDB SQL (mirrors graft.queries.OracleSql.minhashLsh builder) ----
Mod = "18446744073709551616::HUGEINT"
Half = "4294967296::HUGEINT"
def xor_shr33(z):
    return (f"(CAST(xor(CAST({z} // {Half} AS BIGINT), "
            f"CAST(({z} // 8589934592::HUGEINT) // {Half} AS BIGINT)) AS HUGEINT) * {Half} "
            f"+ CAST(xor(CAST({z} % {Half} AS BIGINT), "
            f"CAST(({z} // 8589934592::HUGEINT) % {Half} AS BIGINT)) AS HUGEINT))")
def mulmod(a, c):
    return (f"((({a} % {Half}) * {c}::HUGEINT "
            f"+ ((({a} // {Half}) * {c}::HUGEINT) % {Half}) * {Half}) % {Mod})")
C1 = 0xff51afd7ed558ccd
C2 = 0xc4ceb9fe1a85ec53
seed_vals = ", ".join(f"({k}, {SEEDC[k]}::HUGEINT)" for k in range(NUMH))

sql = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(CASE WHEN len(t) >= 3
      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
      ELSE [array_to_string(t, ' ')] END) AS shingle
    FROM toks)),
poly AS (
  SELECT doc_id, shingle, list_reduce(
    list_concat([{POLYSEED}::HUGEINT],
      list_transform(range(1, len(shingle) + 1),
        i -> CAST(ascii(shingle[i:i]) AS HUGEINT))),
    (acc, x) -> (31 * acc + x) % {Mod}) AS p
  FROM sh),
seeds(k, sc) AS (VALUES {seed_vals}),
h0 AS (SELECT doc_id, k,
  CAST(xor(CAST(p // {Half} AS BIGINT), CAST(sc // {Half} AS BIGINT)) AS HUGEINT) * {Half}
  + CAST(xor(CAST(p % {Half} AS BIGINT), CAST(sc % {Half} AS BIGINT)) AS HUGEINT) AS z
  FROM poly, seeds),
h1 AS (SELECT doc_id, k, {mulmod(xor_shr33('z'), C1)} AS z FROM h0),
h2 AS (SELECT doc_id, k, {mulmod(xor_shr33('z'), C2)} AS z FROM h1),
h3 AS (SELECT doc_id, k, {xor_shr33('z')} AS h FROM h2),
mins AS (SELECT doc_id, k,
  min(CAST(h - CASE WHEN h >= 9223372036854775808::HUGEINT
    THEN {Mod} ELSE 0::HUGEINT END AS BIGINT)) AS mh
  FROM h3 GROUP BY 1, 2),
sig AS (SELECT doc_id, list(mh ORDER BY k) AS mh FROM mins GROUP BY doc_id),
bf0 AS (
  SELECT doc_id, b, list_reduce(
    list_concat([{POLYSEED}::HUGEINT],
      list_transform(mh[b*4+1 : b*4+4],
        v -> CAST(v AS HUGEINT) + CASE WHEN v < 0 THEN {Mod} ELSE 0::HUGEINT END)),
    (acc, x) -> (31 * acc + x) % {Mod}) AS z
  FROM sig, range(0, 8) AS r(b)),
bf1 AS (SELECT doc_id, b, {mulmod(xor_shr33('z'), C1)} AS z FROM bf0),
bf2 AS (SELECT doc_id, b, {mulmod(xor_shr33('z'), C2)} AS z FROM bf1),
bands AS (SELECT doc_id, b, {xor_shr33('z')} AS bh FROM bf2),
ok AS (SELECT b, bh FROM bands GROUP BY b, bh
       HAVING count(*) >= 2 AND count(*) <= {CAP}),
inb AS (SELECT doc_id, b, bh FROM bands JOIN ok USING (b, bh)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM inb a JOIN inb c USING (b, bh) WHERE a.doc_id < c.doc_id)
SELECT doc_a, doc_b,
  CAST(list_sum(list_transform(range(1, 33),
    i -> CASE WHEN sa.mh[i] = sb.mh[i] THEN 1 ELSE 0 END)) AS BIGINT) AS matches
FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b
ORDER BY matches DESC, doc_a, doc_b LIMIT 100
"""
got = con.execute(sql).fetchall()
ok = sorted(got) == sorted(exp)
print("q_minhash_lsh:", "PASS" if ok else "FAIL", len(got), "rows; sql_len", len(sql))
if not ok:
    ge, gg = set(exp), set(got)
    print(" only-expected:", sorted(ge - gg)[:3])
    print(" only-sql:", sorted(gg - ge)[:3])
