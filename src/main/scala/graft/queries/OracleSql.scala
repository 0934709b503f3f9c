package graft.queries

/** DuckDB oracle statements for queries whose Spark implementation uses
  * custom kernels (rolling hash, simhash, LSH-capped joins). Each statement
  * recomputes the SAME result independently in DuckDB — including exact
  * 64-bit wraparound arithmetic, done in HUGEINT with mod-2^64 reductions
  * (DuckDB integers error on overflow rather than wrap, and `xor` only
  * exists for BIGINT, so 64-bit values are split into 32-bit halves where
  * needed). All statements were cross-validated against independent Python
  * reimplementations on sf0.001/sf0.01 before being wired here.
  */
object OracleSql {

  private val Mod = "18446744073709551616::HUGEINT" // 2^64
  private val Half = "4294967296::HUGEINT" // 2^32

  /** 64-entry literal list [2^0, 2^1, ..., 2^63] as HUGEINTs */
  private val pow2List: String =
    (0 until 64).map(b => s"${BigInt(1) << b}::HUGEINT").mkString("[", ", ", "]")

  /** xor64(z, z >>> 33) on a 64-bit value held in HUGEINT, via 32-bit halves */
  private def xorShr33(z: String): String =
    s"""(CAST(xor(CAST($z // $Half AS BIGINT),
       |  CAST(($z // 8589934592::HUGEINT) // $Half AS BIGINT)) AS HUGEINT) * $Half
       |+ CAST(xor(CAST($z % $Half AS BIGINT),
       |  CAST(($z // 8589934592::HUGEINT) % $Half AS BIGINT)) AS HUGEINT))""".stripMargin

  /** (a * c) mod 2^64 without overflowing HUGEINT: split a into halves */
  private def mulMod64(a: String, c: BigInt): String =
    s"""((($a % $Half) * ${c}::HUGEINT
       |+ ((($a // $Half) * ${c}::HUGEINT) % $Half) * $Half) % $Mod)""".stripMargin

  /** shared oracle for the serde round-trip queries (json/xml/toon/
    * protobuf): per-lang counts plus character totals of BOTH the carried
    * n_chars field and the round-tripped text itself — a lossy transcode
    * fails the text-length hash even when row counts survive
    */
  val langRoundtripWithTextLen: String =
    """SELECT lang, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  CAST(sum(len(text)) AS BIGINT) AS total_text_len
      |FROM documents GROUP BY lang""".stripMargin

  /** q_serde_errors: mirrors FormatQueries.serdeErrors — the fault pattern
    * is c_custkey % 7 (residue 3 → IllegalCellException from the
    * unknown-field policy, residue 5 → wire-truncation wrapped as
    * IllegalRowException), and the message-length arithmetic re-derives the
    * EXACT exception strings: the cell message is a constant (spelled out
    * as a SQL literal so a format drift on either side fails the hash), the
    * row message is "illegal row with data [" + trim250(c_name * 20) + "]"
    * where trim250 caps the echo at 250 chars + one '…' (c_name is 18 ASCII
    * chars so 360 → 251; the CASE keeps the SQL honest if name lengths ever
    * change). ORACLE-COUPLED to SerdeErrors.trim250 and both exception
    * message formats — prototype: tools/oracle_proto10.py.
    */
  val serdeErrors: String =
    """WITH base AS (
      |  SELECT c_custkey, c_name,
      |    CASE WHEN c_custkey % 7 = 3 THEN 'illegal_cell'
      |         WHEN c_custkey % 7 = 5 THEN 'illegal_row'
      |         ELSE 'ok' END AS error_kind
      |  FROM customer)
      |SELECT error_kind,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE error_kind
      |    WHEN 'illegal_cell' THEN length('illegal cell on field ''f9'' with data [unknown field number 9 in message graftq.Cust]')
      |    WHEN 'illegal_row' THEN length('illegal row with data [') + (CASE WHEN length(c_name) * 20 <= 250 THEN length(c_name) * 20 ELSE 251 END) + 1
      |    ELSE 0 END) AS BIGINT) AS msg_chars,
      |  CAST(sum(CASE WHEN error_kind = 'ok' THEN c_custkey ELSE 0 END) AS BIGINT) AS key_sum,
      |  CAST(sum(CASE WHEN error_kind = 'ok' THEN length(c_name) ELSE 0 END) AS BIGINT) AS name_chars
      |FROM base
      |GROUP BY error_kind
      |ORDER BY error_kind""".stripMargin

  /** q_infer_schema: re-derives the inference lattice outcome per column
    * from the data itself (InferSchema.classify semantics: integer regex +
    * int32 range → int, wider integer → bigint, numeric → double, else
    * string; all-null → string). Derived over ALL rows where Spark samples
    * 100 — equal whenever column types are stable, which is itself part of
    * what the check asserts.
    */
  val inferSchema: String =
    """WITH vals AS (
      |  SELECT 'doc_id' AS col_name, CAST(doc_id % 1000000 AS VARCHAR) AS v FROM documents
      |  UNION ALL SELECT 'text', text FROM documents
      |  UNION ALL SELECT 'lang', lang FROM documents
      |  UNION ALL SELECT 'source', source FROM documents
      |  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents)
      |SELECT col_name,
      |  CASE
      |    WHEN bool_and(v IS NULL) OR count(v) = 0 THEN 'string'
      |    WHEN bool_and(regexp_matches(trim(v), '^[+-]?[0-9]+$'))
      |         AND max(TRY_CAST(trim(v) AS HUGEINT)) <= 2147483647
      |         AND min(TRY_CAST(trim(v) AS HUGEINT)) >= -2147483648 THEN 'int'
      |    WHEN bool_and(regexp_matches(trim(v), '^[+-]?[0-9]+$'))
      |         AND max(TRY_CAST(trim(v) AS HUGEINT)) <= 9223372036854775807
      |         AND min(TRY_CAST(trim(v) AS HUGEINT)) >= -9223372036854775808 THEN 'bigint'
      |    WHEN bool_and(regexp_matches(trim(v),
      |      '^[+-]?([0-9]+|[0-9]+\.[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$')) THEN 'double'
      |    ELSE 'string'
      |  END AS inferred_type
      |FROM vals GROUP BY col_name ORDER BY col_name""".stripMargin

  /** q_quality_score: integer char/token/stopword stats per doc */
  val qualityScore: String =
    """SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_filter(string_split(text, ' '),
      |    t -> t IN ('the','a','of','and','to','in','is','on'))) AS BIGINT) AS stop_hits,
      |  (10000 * CAST(len(list_filter(string_split(text, ' '),
      |    t -> t IN ('the','a','of','and','to','in','is','on'))) AS BIGINT))
      |    // CAST(len(string_split(text, ' ')) AS BIGINT) AS stopword_bp,
      |  (100 * CAST(len(text) AS BIGINT))
      |    // CAST(len(string_split(text, ' ')) AS BIGINT) AS mean_token_len_c
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q_ngram_jaccard: word-3-shingle Jaccard, shingles with doc-frequency
    * above the cap dropped before the self-join (mirrors the Spark guard)
    */
  def ngramJaccard(cap: Int): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id, unnest(CASE WHEN len(t) >= 3
       |      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
       |      ELSE [array_to_string(t, ' ')] END) AS shingle
       |    FROM toks)),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       |freq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
       |pruned AS (SELECT s.doc_id, s.shingle FROM sh s JOIN freq f USING (shingle)
       |           WHERE f.df <= $cap),
       |shared AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |  FROM pruned a JOIN pruned b USING (shingle)
       |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT doc_a, doc_b, shared, sz_a, sz_b,
       |  (10000 * shared) // (sz_a + sz_b - shared) AS jac_bp
       |FROM (SELECT s.doc_a, s.doc_b, s.shared, sa.sz AS sz_a, sb.sz AS sz_b
       |      FROM shared s JOIN sizes sa ON sa.doc_id = s.doc_a
       |      JOIN sizes sb ON sb.doc_id = s.doc_b) t
       |ORDER BY CAST(shared AS DOUBLE) / (sz_a + sz_b - shared) DESC, doc_a, doc_b
       |LIMIT 50""".stripMargin

  /** q_lang_id: char-trigram profiles (top 50 per lang) + per-doc argmax */
  val langId: String =
    """WITH tri AS (
      |  SELECT lang, doc_id, tri, count(*) AS cnt FROM (
      |    SELECT lang, doc_id,
      |      unnest(list_transform(range(1, len(text) - 1), i -> text[i:i+2])) AS tri
      |    FROM documents WHERE len(text) >= 3) t
      |  GROUP BY 1, 2, 3),
      |prof AS (
      |  SELECT lang AS profile_lang, tri FROM (
      |    SELECT lang, tri, row_number() OVER (PARTITION BY lang
      |      ORDER BY sum(cnt) DESC, tri) AS rnk
      |    FROM tri GROUP BY lang, tri) p WHERE rnk <= 50),
      |scored AS (
      |  SELECT doc_id, lang, profile_lang,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY sum(cnt) DESC, profile_lang) AS rnk
      |  FROM tri JOIN prof USING (tri) GROUP BY doc_id, lang, profile_lang)
      |SELECT lang, profile_lang AS guessed, count(*) AS docs
      |FROM scored WHERE rnk = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q_fingerprint: Rabin–Karp rolling hash (window 16, base 1000003,
    * mod 2^64), per-doc unsigned min over all windows, 16-hex-digit output.
    * The window hash is computed positionally: h(s) = Σ c(s+k)·B^(15-k).
    */
  val fingerprint: String = {
    val B = BigInt(1000003)
    val mod = BigInt(1) << 64
    // powList[k+1] = B^k mod 2^64
    val powList = (0 until 16).map(k => s"${B.modPow(BigInt(k), mod)}::HUGEINT")
      .mkString("[", ", ", "]")
    s"""WITH d AS (SELECT doc_id, text, len(text) AS n FROM documents),
       |cp AS (SELECT doc_id, n,
       |         list_transform(range(1, n + 1),
       |           i -> CAST(ascii(text[i:i]) AS HUGEINT)) AS cps
       |       FROM d),
       |h AS (SELECT doc_id,
       |  CASE
       |    WHEN n = 0 THEN 0::HUGEINT
       |    WHEN n < 16 THEN
       |      list_sum(list_transform(range(1, n + 1),
       |        i -> cps[i] * ($powList)[n - i + 1])) % $Mod
       |    ELSE
       |      list_min(list_transform(range(1, n - 14),
       |        s -> list_sum(list_transform(range(0, 16),
       |               k -> cps[s + k] * ($powList)[16 - k]))
       |             % $Mod))
       |  END AS v
       |  FROM cp)
       |SELECT doc_id,
       |  printf('%08x%08x',
       |    CAST(v // $Half AS BIGINT),
       |    CAST(v % $Half AS BIGINT)) AS fingerprint_hex
       |FROM h ORDER BY doc_id""".stripMargin
  }

  /** q_simhash: per-token polynomial hash (seed 1125899906842597, base 31)
    * finalized with murmur fmix64, 64 bit-majority votes per doc — the exact
    * semantics of graft.functions.SimHashImpl, replayed in HUGEINT.
    */
  val simhash: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != '')) AS tok
       |  FROM documents),
       |h0 AS (
       |  SELECT doc_id, list_reduce(
       |      list_concat([1125899906842597::HUGEINT],
       |        list_transform(range(1, len(tok) + 1),
       |          i -> CAST(ascii(tok[i:i]) AS HUGEINT))),
       |      (acc, x) -> (31 * acc + x) % $Mod) AS z
       |  FROM tok),
       |x1 AS (SELECT doc_id, ${xorShr33("z")} AS a FROM h0),
       |m1 AS (SELECT doc_id, ${mulMod64("a", BigInt("ff51afd7ed558ccd", 16))} AS z FROM x1),
       |x2 AS (SELECT doc_id, ${xorShr33("z")} AS a FROM m1),
       |m2 AS (SELECT doc_id, ${mulMod64("a", BigInt("c4ceb9fe1a85ec53", 16))} AS z FROM x2),
       |th AS (SELECT doc_id, ${xorShr33("z")} AS h FROM m2),
       |bits AS (
       |  SELECT doc_id, b,
       |    sum(CASE WHEN CAST((h // ($pow2List)[b + 1]) % 2 AS INT) = 1
       |        THEN 1 ELSE -1 END) AS vote
       |  FROM th, range(0, 64) AS r(b) GROUP BY doc_id, b),
       |vals AS (
       |  SELECT d.doc_id,
       |    coalesce(sum(CASE WHEN vote > 0 THEN ($pow2List)[b + 1] ELSE 0::HUGEINT END),
       |      0::HUGEINT) AS v
       |  FROM (SELECT DISTINCT doc_id FROM documents) d
       |  LEFT JOIN bits USING (doc_id) GROUP BY d.doc_id)
       |SELECT doc_id,
       |  printf('%08x%08x',
       |    CAST(v // $Half AS BIGINT),
       |    CAST(v % $Half AS BIGINT)) AS simhash_hex
       |FROM vals ORDER BY doc_id""".stripMargin

  /** q_minhash_lsh: the FULL minhash pipeline replayed — per-shingle
    * polynomial hash, 32 seeded fmix64 variants (seed constants precomputed
    * here exactly as graft.functions.MinHashImpl does), SIGNED per-seed
    * mins (Spark `min` over longs), band fold-hash bucketing with the same
    * 2..cap bucket filter, candidate pairs, and integer signature match
    * counts. Cross-validated against an independent Python mirror.
    */
  def minhashLsh(numHashes: Int, bands: Int, cap: Int): String = {
    val golden = BigInt("9e3779b97f4a7c15", 16)
    val c1 = BigInt("ff51afd7ed558ccd", 16)
    val c2 = BigInt("c4ceb9fe1a85ec53", 16)
    val mod = BigInt(1) << 64
    def fmix(z0: BigInt): BigInt = {
      var z = z0
      z = ((z ^ (z >> 33)) * c1).mod(mod)
      z = ((z ^ (z >> 33)) * c2).mod(mod)
      z ^ (z >> 33)
    }
    val polySeed = 1125899906842597L
    val rpb = numHashes / bands
    val seedVals = (0 until numHashes)
      .map(k => s"($k, ${fmix((BigInt(k) * golden).mod(mod))}::HUGEINT)")
      .mkString(", ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id, unnest(CASE WHEN len(t) >= 3
       |      THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
       |      ELSE [array_to_string(t, ' ')] END) AS shingle
       |    FROM toks)),
       |poly AS (
       |  SELECT doc_id, shingle, list_reduce(
       |    list_concat([$polySeed::HUGEINT],
       |      list_transform(range(1, len(shingle) + 1),
       |        i -> CAST(ascii(shingle[i:i]) AS HUGEINT))),
       |    (acc, x) -> (31 * acc + x) % $Mod) AS p
       |  FROM sh),
       |seeds(k, sc) AS (VALUES $seedVals),
       |h0 AS (SELECT doc_id, k,
       |  CAST(xor(CAST(p // $Half AS BIGINT), CAST(sc // $Half AS BIGINT)) AS HUGEINT) * $Half
       |  + CAST(xor(CAST(p % $Half AS BIGINT), CAST(sc % $Half AS BIGINT)) AS HUGEINT) AS z
       |  FROM poly, seeds),
       |h1 AS (SELECT doc_id, k, ${mulMod64(xorShr33("z"), c1)} AS z FROM h0),
       |h2 AS (SELECT doc_id, k, ${mulMod64(xorShr33("z"), c2)} AS z FROM h1),
       |h3 AS (SELECT doc_id, k, ${xorShr33("z")} AS h FROM h2),
       |mins AS (SELECT doc_id, k,
       |  min(CAST(h - CASE WHEN h >= 9223372036854775808::HUGEINT
       |    THEN $Mod ELSE 0::HUGEINT END AS BIGINT)) AS mh
       |  FROM h3 GROUP BY 1, 2),
       |sig AS (SELECT doc_id, list(mh ORDER BY k) AS mh FROM mins GROUP BY doc_id),
       |bf0 AS (
       |  SELECT doc_id, b, list_reduce(
       |    list_concat([$polySeed::HUGEINT],
       |      list_transform(mh[b*$rpb+1 : b*$rpb+$rpb],
       |        v -> CAST(v AS HUGEINT) + CASE WHEN v < 0 THEN $Mod ELSE 0::HUGEINT END)),
       |    (acc, x) -> (31 * acc + x) % $Mod) AS z
       |  FROM sig, range(0, $bands) AS r(b)),
       |bf1 AS (SELECT doc_id, b, ${mulMod64(xorShr33("z"), c1)} AS z FROM bf0),
       |bf2 AS (SELECT doc_id, b, ${mulMod64(xorShr33("z"), c2)} AS z FROM bf1),
       |bandhash AS (SELECT doc_id, b, ${xorShr33("z")} AS bh FROM bf2),
       |ok AS (SELECT b, bh FROM bandhash GROUP BY b, bh
       |       HAVING count(*) >= 2 AND count(*) <= $cap),
       |inb AS (SELECT doc_id, b, bh FROM bandhash JOIN ok USING (b, bh)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
       |  FROM inb a JOIN inb c USING (b, bh) WHERE a.doc_id < c.doc_id)
       |SELECT doc_a, doc_b,
       |  CAST(list_sum(list_transform(range(1, ${numHashes + 1}),
       |    i -> CASE WHEN sa.mh[i] = sb.mh[i] THEN 1 ELSE 0 END)) AS BIGINT) AS matches
       |FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b
       |ORDER BY matches DESC, doc_a, doc_b LIMIT 100""".stripMargin
  }

  /** Shared head for the embedding-LSH oracles: the seeded hyperplane
    * weights are deterministic CONSTANTS (EmbedQueries.planeWeight), so
    * they are embedded as double literals (Double.toString round-trips
    * exactly); bits-per-band uses the same integer ceil-div + bit-length
    * formula as EmbedQueries.lshBitsFor. Planes are a VALUES table joined
    * by index — a literal list inside a lambda re-materializes per element
    * and is pathologically slow.
    */
  private def embedLshCommon(maxBits: Int): String = {
    // the planes table must cover EVERY bits value lshBitsFor can produce
    // (cap 24): a maxBits below the runtime bits would silently drop plane
    // indices from the join and diverge exactly at large corpus sizes
    require(maxBits >= EmbedQueries.MaxLshBits,
      s"oracle maxBits=$maxBits < lshBitsFor cap ${EmbedQueries.MaxLshBits} — planes table would be incomplete")
    val dim = 64
    val planeVals = (0 until EmbedQueries.LshBands * maxBits).map { idx =>
      val row = (0 until dim).map(j => EmbedQueries.planeWeight(idx, j).toString)
      s"($idx, [${row.mkString(", ")}])"
    }.mkString(", ")
    val target = EmbedQueries.LshTargetBucket
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |nn AS (SELECT CAST(LEAST(${EmbedQueries.MaxLshBits}, GREATEST(4, CASE WHEN m <= 1 THEN 0
       |         ELSE length(bin(m - 1)) END)) AS INT) AS bits
       |       FROM (SELECT (GREATEST(1, count(*)) + $target - 1) // $target AS m FROM e) t),
       |planes(idx, pl) AS (VALUES $planeVals),
       |dots AS (
       |  SELECT vec_id, idx // bits AS b, idx % bits AS p,
       |    list_sum(list_transform(range(1, ${dim + 1}), j -> pl[j] * emb[j])) AS dot
       |  FROM e, nn, planes WHERE idx < ${EmbedQueries.LshBands} * bits),
       |sig AS (
       |  SELECT vec_id, b,
       |    CAST(sum(CASE WHEN dot >= 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS s
       |  FROM dots GROUP BY 1, 2)""".stripMargin
  }

  /** q_embed_lsh_buckets: per-band bucket-size histogram */
  def embedLshBuckets(maxBits: Int = EmbedQueries.MaxLshBits): String =
    embedLshCommon(maxBits) +
      """
        |SELECT b AS band, cnt AS bucket_size, count(*) AS n_buckets FROM (
        |  SELECT b, s, count(*) AS cnt FROM sig GROUP BY b, s) t
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q_embed_neardup: LSH-bucketed candidate PAIRS (id_a < id_b), exact
    * cosine, global top-NearDupTopN by (cos desc, id_a, id_b) — validated
    * against the Python mirror in tools/oracle_proto6.py
    */
  def embedNearDup(maxBits: Int = EmbedQueries.MaxLshBits): String =
    embedLshCommon(maxBits) +
      s""",
         |ok AS (SELECT b, s FROM sig GROUP BY b, s
         |       HAVING count(*) >= 2 AND count(*) <= ${EmbedQueries.LshBucketCap}),
         |inb AS (SELECT vec_id, b, s FROM sig JOIN ok USING (b, s)),
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         |  FROM inb x JOIN inb y USING (b, s) WHERE x.vec_id < y.vec_id),
         |nrm AS (SELECT vec_id, emb,
         |          sqrt(list_sum(list_transform(emb, x -> x * x))) AS nm FROM e),
         |scored AS (
         |  SELECT id_a, id_b,
         |    CASE WHEN a.nm * b2.nm = 0 THEN -1 ELSE
         |      list_sum(list_transform(range(1, 65), j -> a.emb[j] * b2.emb[j]))
         |        / (a.nm * b2.nm) END AS cos
         |  FROM cand JOIN nrm a ON a.vec_id = id_a
         |  JOIN nrm b2 ON b2.vec_id = id_b),
         |r AS (SELECT id_a, id_b,
         |        CAST(row_number() OVER (ORDER BY cos DESC, id_a, id_b) AS BIGINT) AS rnk,
         |        cos
         |      FROM scored)
         |SELECT id_a, id_b, rnk, CAST(round(cos * 1000000) AS BIGINT) AS cos_r6
         |FROM r WHERE rnk <= ${EmbedQueries.NearDupTopN} ORDER BY rnk""".stripMargin

  /** q_neardup_clusters: connected components over the thresholded
    * near-dup pair graph — same candidate pairs as q_embed_neardup, kept
    * when exact cosine >= EmbedQueries.ClusterTau, then a RECURSIVE
    * reachability closure labels every vertex with the min vec_id it can
    * reach (identical to Spark's min-label fixpoint). Validated against
    * the python union-find mirror in tools/oracle_proto7.py.
    */
  def nearDupClusters(maxBits: Int = EmbedQueries.MaxLshBits): String =
    "WITH RECURSIVE " + embedLshCommon(maxBits).stripPrefix("WITH ") +
      s""",
         |ok AS (SELECT b, s FROM sig GROUP BY b, s
         |       HAVING count(*) >= 2 AND count(*) <= ${EmbedQueries.LshBucketCap}),
         |inb AS (SELECT vec_id, b, s FROM sig JOIN ok USING (b, s)),
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         |  FROM inb x JOIN inb y USING (b, s) WHERE x.vec_id < y.vec_id),
         |nrm AS (SELECT vec_id, emb,
         |          sqrt(list_sum(list_transform(emb, x -> x * x))) AS nm FROM e),
         |prs AS (
         |  SELECT id_a, id_b FROM cand
         |  JOIN nrm a ON a.vec_id = id_a JOIN nrm b2 ON b2.vec_id = id_b
         |  WHERE CASE WHEN a.nm * b2.nm = 0 THEN -1 ELSE
         |    list_sum(list_transform(range(1, 65), j -> a.emb[j] * b2.emb[j]))
         |      / (a.nm * b2.nm) END >= CAST(${EmbedQueries.ClusterTau} AS DOUBLE)),
         |verts AS (SELECT DISTINCT v FROM
         |  (SELECT id_a AS v FROM prs UNION ALL SELECT id_b FROM prs)),
         |edg AS (SELECT id_a AS src, id_b AS dst FROM prs
         |        UNION ALL SELECT id_b, id_a FROM prs),
         |reach(v, u) AS (
         |  SELECT v, v FROM verts
         |  UNION
         |  SELECT r.v, e2.dst FROM reach r JOIN edg e2 ON e2.src = r.u)
         |SELECT CAST(u AS BIGINT) AS cluster_id, CAST(count(*) AS BIGINT) AS csize,
         |  CAST(sum(v) AS BIGINT) AS member_sum
         |FROM (SELECT v, min(u) AS u FROM reach GROUP BY v) labels
         |GROUP BY u ORDER BY 1""".stripMargin

  /** q_embed_lsh_topk: bucket-capped candidates + exact cosine re-rank */
  def embedLshTopK(maxBits: Int = EmbedQueries.MaxLshBits): String =
    embedLshCommon(maxBits) +
      s""",
         |ok AS (SELECT b, s FROM sig GROUP BY b, s
         |       HAVING count(*) >= 2 AND count(*) <= ${EmbedQueries.LshBucketCap}),
         |inb AS (SELECT vec_id, b, s FROM sig JOIN ok USING (b, s)),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM inb q JOIN inb c USING (b, s)
         |  WHERE q.vec_id < ${EmbedQueries.NumQueries} AND c.vec_id != q.vec_id),
         |nrm AS (SELECT vec_id, emb,
         |          sqrt(list_sum(list_transform(emb, x -> x * x))) AS nm FROM e),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |    CASE WHEN a.nm * b2.nm = 0 THEN -1 ELSE
         |      list_sum(list_transform(range(1, 65), j -> a.emb[j] * b2.emb[j]))
         |        / (a.nm * b2.nm) END AS cos
         |  FROM cand JOIN nrm a ON a.vec_id = query_id
         |  JOIN nrm b2 ON b2.vec_id = neighbor_id),
         |r AS (SELECT query_id, neighbor_id,
         |        CAST(row_number() OVER (PARTITION BY query_id
         |          ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk, cos
         |      FROM scored)
         |SELECT query_id, neighbor_id, rnk,
         |  CAST(round(cos * 1000000) AS BIGINT) AS cos_r6
         |FROM r WHERE rnk <= ${EmbedQueries.K} ORDER BY query_id, rnk""".stripMargin

  /** q_embed_ivf_topk: replay the IVF pipeline — cell count from the same
    * integer bit-length formula as `EmbedQueries.ivfCellsFor`
    * (`length(printf('%b', n))` == 64 - nlz), max-cosine assignment with
    * ties to the smaller cell, top-IvfProbe probes per query, the 8×
    * expected-population cell cap, exact re-rank — all in the fixed-order
    * DOUBLE arithmetic of embedTopK
    */
  val embedIvfTopK: String = {
    val nq = EmbedQueries.NumQueries
    val probe = EmbedQueries.IvfProbe
    val k = EmbedQueries.K
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |n AS (SELECT vec_id, emb,
       |        sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm FROM e),
       |prm AS (SELECT LEAST(4096, GREATEST(8,
       |          1::BIGINT << (length(printf('%b', cnt)) // 2))) AS cells, cnt
       |        FROM (SELECT count(*) AS cnt FROM e)),
       |cap AS (SELECT 8 * ((cnt + cells - 1) // cells) AS cellcap FROM prm),
       |sc AS (SELECT v.vec_id, a.vec_id AS cell_id,
       |        CASE WHEN v.nrm * a.nrm = 0 THEN -1 ELSE
       |          list_sum(list_transform(range(1, 65), i -> v.emb[i] * a.emb[i]))
       |            / (v.nrm * a.nrm) END AS cos
       |       FROM n v, n a, prm WHERE a.vec_id < prm.cells),
       |rk AS (SELECT vec_id, cell_id, cos,
       |        row_number() OVER (PARTITION BY vec_id
       |          ORDER BY cos DESC, cell_id) AS r FROM sc),
       |assigned AS (SELECT vec_id AS neighbor_id, cell_id FROM rk WHERE r = 1),
       |ok AS (SELECT cell_id FROM assigned, cap
       |       GROUP BY cell_id, cap.cellcap HAVING count(*) <= cap.cellcap),
       |probes AS (SELECT vec_id AS query_id, cell_id FROM rk
       |           WHERE vec_id < $nq AND r <= $probe),
       |cand AS (SELECT p.query_id, a.neighbor_id
       |         FROM probes p
       |         JOIN ok USING (cell_id)
       |         JOIN assigned a USING (cell_id)
       |         WHERE a.neighbor_id != p.query_id),
       |pairs AS (SELECT c.query_id, c.neighbor_id,
       |        CASE WHEN q.nrm * nb.nrm = 0 THEN -1 ELSE
       |          list_sum(list_transform(range(1, 65), i -> q.emb[i] * nb.emb[i]))
       |            / (q.nrm * nb.nrm) END AS cos
       |        FROM cand c
       |        JOIN n q ON q.vec_id = c.query_id
       |        JOIN n nb ON nb.vec_id = c.neighbor_id),
       |r2 AS (SELECT query_id, neighbor_id,
       |        CAST(row_number() OVER (PARTITION BY query_id
       |          ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk, cos
       |       FROM pairs)
       |SELECT query_id, neighbor_id, rnk,
       |  CAST(round(cos * 1000000) AS BIGINT) AS cos_r6
       |FROM r2 WHERE rnk <= $k ORDER BY query_id, rnk""".stripMargin
  }

  /** q_media_stats: replay Multimodal.oracleRow's modular arithmetic — the
    * media table's every parameter and payload byte is a pure function of
    * the row id, so the decoded-container aggregates (dimensions, rates,
    * sample counts, sampled-frame byte sums) recompute exactly in SQL with
    * no container parsing. Validated against the python generator mirror
    * in tools/oracle_proto8.py. ORACLE-COUPLED to Multimodal.oracleRow and
    * MediaQueries.SampleEveryNth (= 2, the `f % 2 = 0` filter below).
    */
  val mediaStats: String =
    """WITH nn AS (SELECT count(*) AS c FROM documents),
      |ids AS (SELECT unnest(range(0, c)) AS i FROM nn),
      |img AS (SELECT i, 16 + (i*7) % 64 AS w, 16 + (i*11) % 64 AS h
      |        FROM ids WHERE i % 3 = 0),
      |aud AS (SELECT i, rate, (rate * dur) // 1000 AS ns FROM (
      |          SELECT i, 8000 + (i*37) % 8000 AS rate, 100 + (i*13) % 500 AS dur
      |          FROM ids WHERE i % 3 = 1)),
      |vid AS (SELECT i, 8 + (i*5) % 24 AS w, 8 + (i*3) % 24 AS h,
      |               4 + (i*7) % 12 AS nf
      |        FROM ids WHERE i % 3 = 2),
      |u AS (
      |  SELECT 'image' AS kind, count(*) AS n,
      |    CAST(sum(w) AS BIGINT) AS sum_w, CAST(sum(h) AS BIGINT) AS sum_h,
      |    0::BIGINT AS sum_rate, 0::BIGINT AS sum_samples,
      |    0::BIGINT AS sum_frames, 0::BIGINT AS frames_sampled,
      |    CAST(sum(list_sum(list_transform(range(0, 3*w*h),
      |      j -> (i + 3*j) % 256))) AS BIGINT) AS payload_sum
      |  FROM img
      |  UNION ALL
      |  SELECT 'audio', count(*), 0, 0,
      |    CAST(sum(rate) AS BIGINT), CAST(sum(ns) AS BIGINT), 0, 0,
      |    CAST(sum(list_sum(list_transform(range(0, ns),
      |      k -> (i*31 + k*17) % 65536))) AS BIGINT)
      |  FROM aud
      |  UNION ALL
      |  SELECT 'video', count(*),
      |    CAST(sum(w) AS BIGINT), CAST(sum(h) AS BIGINT), 0, 0,
      |    CAST(sum(nf) AS BIGINT), CAST(sum((nf + 1) // 2) AS BIGINT),
      |    CAST(sum(list_sum(list_transform(list_filter(range(0, nf), f -> f % 2 = 0),
      |      f -> list_sum(list_transform(range(0, 3*w*h),
      |             j -> (i + f*11 + j*7) % 256))))) AS BIGINT)
      |  FROM vid)
      |SELECT * FROM u WHERE n > 0 ORDER BY kind""".stripMargin

  /** q_embed_topk: exact cosine top-k in DOUBLE arithmetic with the same
    * left-to-right summation order as the Spark fold
    */
  val embedTopK: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |n AS (SELECT vec_id, emb,
      |        sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm FROM e),
      |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |        CASE WHEN q.nrm * c.nrm = 0 THEN -1 ELSE
      |          list_sum(list_transform(range(1, 65), i -> q.emb[i] * c.emb[i]))
      |            / (q.nrm * c.nrm) END AS cos
      |      FROM n q, n c
      |      WHERE q.vec_id < ${EmbedQueries.NumQueries} AND c.vec_id != q.vec_id),
      |r AS (SELECT query_id, neighbor_id,
      |        CAST(row_number() OVER (PARTITION BY query_id
      |          ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk, cos
      |      FROM p)
      |SELECT query_id, neighbor_id, rnk,
      |  CAST(round(cos * 1000000) AS BIGINT) AS cos_r6
      |FROM r WHERE rnk <= ${EmbedQueries.K} ORDER BY query_id, rnk""".stripMargin
}
