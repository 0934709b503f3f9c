# Prototype harness for new DuckDB oracle SQL (driver-side python only).
# For each candidate oracle, reimplements the Spark query's exact semantics
# in Python (64-bit wraparound etc.) and compares result SETS with the SQL.
import duckdb, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

docs = con.execute("SELECT doc_id, lang, source, text FROM documents").fetchall()
M = (1 << 64) - 1

def check(name, expected, sql):
    got = con.execute(sql).fetchall()
    e, g = sorted(expected), sorted(got)
    ok = e == g
    print(f"{name}: {'PASS' if ok else 'FAIL'} ({len(e)} rows)")
    if not ok:
        eset, gset = set(e), set(g)
        print("  only-expected:", list(eset - gset)[:3])
        print("  only-sql     :", list(gset - eset)[:3])
    return ok

# ---------------- q_quality_score ----------------
STOP = {"the", "a", "of", "and", "to", "in", "is", "on"}
exp = []
for doc_id, lang, source, text in docs:
    toks = text.split(" ")  # python split(' ') keeps empties like Spark regex ' '
    n_chars, n_tokens = len(text), len(toks)
    stop_hits = sum(1 for t in toks if t in STOP)
    exp.append((doc_id, n_chars, n_tokens, stop_hits,
                (10000 * stop_hits) // n_tokens, (100 * n_chars) // n_tokens))
check("q_quality_score", exp, """
SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  CAST(len(list_filter(string_split(text, ' '),
    t -> t IN ('the','a','of','and','to','in','is','on'))) AS BIGINT) AS stop_hits,
  (10000 * CAST(len(list_filter(string_split(text, ' '),
    t -> t IN ('the','a','of','and','to','in','is','on'))) AS BIGINT))
    // CAST(len(string_split(text, ' ')) AS BIGINT) AS stopword_bp,
  (100 * CAST(len(text) AS BIGINT))
    // CAST(len(string_split(text, ' ')) AS BIGINT) AS mean_token_len_c
FROM documents ORDER BY doc_id
""")

# ---------------- q_ngram_jaccard (ShingleDocFreqCap = 100) ----------------
CAP = 100
sh = {}
for doc_id, lang, source, text in docs:
    toks = text.split(" ")
    if len(toks) >= 3:
        s = {" ".join(toks[i:i+3]) for i in range(len(toks) - 2)}
    else:
        s = {" ".join(toks)}
    sh[doc_id] = s
from collections import Counter
df_counts = Counter(x for s in sh.values() for x in s)
heavy = {x for x, c in df_counts.items() if c > CAP}
pruned = {d: {x for x in s if x not in heavy} for d, s in sh.items()}
pairs = Counter()
inv = {}
for d, s in pruned.items():
    for x in s:
        inv.setdefault(x, []).append(d)
for x, ds in inv.items():
    ds.sort()
    for i in range(len(ds)):
        for j in range(i + 1, len(ds)):
            pairs[(ds[i], ds[j])] += 1
rows = []
for (a, b), shared in pairs.items():
    sa, sb = len(sh[a]), len(sh[b])
    rows.append((shared / (sa + sb - shared), a, b, shared, sa, sb,
                 (10000 * shared) // (sa + sb - shared)))
rows.sort(key=lambda r: (-r[0], r[1], r[2]))
exp = [r[1:] for r in rows[:50]]
check("q_ngram_jaccard", exp, f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(CASE WHEN len(t) >= 3
      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
      ELSE [array_to_string(t, ' ')] END) AS shingle
    FROM toks)),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
freq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
pruned AS (SELECT s.doc_id, s.shingle FROM sh s JOIN freq f USING (shingle)
           WHERE f.df <= {CAP}),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM pruned a JOIN pruned b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b, shared, sz_a, sz_b,
  (10000 * shared) // (sz_a + sz_b - shared) AS jac_bp
FROM (SELECT s.doc_a, s.doc_b, s.shared, sa.sz AS sz_a, sb.sz AS sz_b
      FROM shared s JOIN sizes sa ON sa.doc_id = s.doc_a
      JOIN sizes sb ON sb.doc_id = s.doc_b) t
ORDER BY CAST(shared AS DOUBLE) / (sz_a + sz_b - shared) DESC, doc_a, doc_b
LIMIT 50
""")

# ---------------- q_lang_id ----------------
tri = Counter()  # (lang, doc_id, trigram) -> cnt
for doc_id, lang, source, text in docs:
    for i in range(len(text) - 2):
        tri[(lang, doc_id, text[i:i+3])] += 1
prof_counts = Counter()
for (lang, doc_id, t), c in tri.items():
    prof_counts[(lang, t)] += c
prof = set()
bylang = {}
for (lang, t), c in prof_counts.items():
    bylang.setdefault(lang, []).append((-c, t))
for lang, lst in bylang.items():
    lst.sort()
    for _, t in lst[:50]:
        prof.add((lang, t))
score = Counter()
for (lang, doc_id, t), c in tri.items():
    for plang in bylang:
        if (plang, t) in prof:
            score[(doc_id, lang, plang)] += c
best = {}
for (doc_id, lang, plang), c in score.items():
    cur = best.get(doc_id)
    if cur is None or (-c, plang) < (cur[0], cur[1]):
        best[doc_id] = (-c, plang, lang)
conf = Counter()
for doc_id, (_, plang, lang) in best.items():
    conf[(lang, plang)] += 1
exp = [(lang, g, c) for (lang, g), c in conf.items()]
check("q_lang_id", exp, """
WITH tri AS (
  SELECT lang, doc_id, tri, count(*) AS cnt FROM (
    SELECT lang, doc_id,
      unnest(list_transform(range(1, len(text) - 1), i -> text[i:i+2])) AS tri
    FROM documents WHERE len(text) >= 3) t
  GROUP BY 1, 2, 3),
prof AS (
  SELECT lang AS profile_lang, tri FROM (
    SELECT lang, tri, row_number() OVER (PARTITION BY lang
      ORDER BY sum(cnt) DESC, tri) AS rnk
    FROM tri GROUP BY lang, tri) p WHERE rnk <= 50),
scored AS (
  SELECT doc_id, lang, profile_lang,
    row_number() OVER (PARTITION BY doc_id
      ORDER BY sum(cnt) DESC, profile_lang) AS rnk
  FROM tri JOIN prof USING (tri) GROUP BY doc_id, lang, profile_lang)
SELECT lang, profile_lang AS guessed, count(*) AS docs
FROM scored WHERE rnk = 1 GROUP BY 1, 2 ORDER BY 1, 2
""")

# ---------------- q_fingerprint (rolling min-hash, window 16) ----------------
B = 1000003
def rolling_min(text, window=16):
    n = len(text)
    if n == 0:
        return 0
    if n < window:
        h = 0
        for ch in text:
            h = (h * B + ord(ch)) & M
        return h
    bpow = pow(B, window - 1, 1 << 64)
    h = 0
    for i in range(window):
        h = (h * B + ord(text[i])) & M
    mn = h
    for i in range(window, n):
        h = ((h - ord(text[i - window]) * bpow) * B + ord(text[i])) & M
        mn = min(mn, h)
    return mn
exp = [(doc_id, format(rolling_min(text), "016x")) for doc_id, _, _, text in docs]
POW = [pow(B, k, 1 << 64) for k in range(16)]  # pw[k+1] = B^k
pw_sql = "[" + ", ".join(f"{p}::HUGEINT" for p in POW) + "]"
check("q_fingerprint", exp, f"""
WITH d AS (SELECT doc_id, text, len(text) AS n FROM documents),
cp AS (SELECT doc_id, n,
         list_transform(range(1, n + 1),
           i -> CAST(ascii(text[i:i]) AS HUGEINT)) AS cps
       FROM d),
h AS (SELECT doc_id,
  CASE
    WHEN n = 0 THEN 0::HUGEINT
    WHEN n < 16 THEN
      list_sum(list_transform(range(1, n + 1),
        i -> cps[i] * ({pw_sql})[n - i + 1])) % 18446744073709551616::HUGEINT
    ELSE
      list_min(list_transform(range(1, n - 14),
        s -> list_sum(list_transform(range(0, 16),
               k -> cps[s + k] * ({pw_sql})[16 - k]))
             % 18446744073709551616::HUGEINT))
  END AS v
  FROM cp)
SELECT doc_id,
  printf('%08x%08x',
    CAST(v // 4294967296::HUGEINT AS BIGINT),
    CAST(v % 4294967296::HUGEINT AS BIGINT)) AS fingerprint_hex
FROM h ORDER BY doc_id
""")
