package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query takes (spark, sfDir) and reads the driver-generated parquet
  * tables. Queries with a DuckDB-expressible oracle appear in `oracleSql`
  * with IDENTICAL output column names; engine-internal queries (codec
  * payloads, LSH signatures, heuristics) are rows-only by contract.
  */
object SparkEntry {

  /** Flagship: engine round-trip on sf0.001 — encode documents per-column,
    * decode, emit per-row sha256 identity projection (driver smoke-checks
    * rows > 0; full bit-identity is checked by q_roundtrip_sha's oracle).
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.roundtripSha(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // engine: stats pass / skew plan / selection / metrics / round-trip
    "q_stats_cols" -> (CoreQueries.statsCols _),
    "q_skew_plan" -> (CoreQueries.skewPlan _),
    "q_roundtrip_sha" -> (CoreQueries.roundtripSha _),
    "q_point_lookup" -> (CoreQueries.pointLookup _),
    "q_dsv2_lookup" -> (CoreQueries.dsv2Lookup _),
    "q_dsv2_agg" -> (CoreQueries.dsv2Agg _),
    "q_key_lookup" -> (CoreQueries.keyLookup _),
    "q_compact_roundtrip" -> (CoreQueries.compactRoundtrip _),
    "q_stream_roundtrip" -> (CoreQueries.streamRoundtrip _),
    "q_topn" -> (CoreQueries.topN _),
    "q_codec_selection" -> (CoreQueries.codecSelection _),
    "q_codec_decisions" -> (CoreQueries.codecDecisions _),
    "q_encode_metrics" -> (CoreQueries.encodeMetrics _),
    "q_encode_blocks" -> (CoreQueries.encodeBlocks _),
    // relational coverage: agg / broadcast join / window / time window
    "q1_agg" -> (CoreQueries.q1Agg _),
    "q_join_revenue" -> (CoreQueries.joinRevenue _),
    "q_window_top_orders" -> (CoreQueries.windowTopOrders _),
    "q_events_hourly" -> (CoreQueries.eventsHourly _),
    // dedup suite
    "q_dedup_exact" -> (DedupQueries.dedupExact _),
    "q_minhash_lsh" -> (DedupQueries.minhashLsh _),
    "q_simhash" -> (DedupQueries.simhash _),
    "q_ngram_jaccard" -> (DedupQueries.ngramJaccard _),
    // text analysis
    "q_token_stats" -> (TextQueries.tokenStats _),
    "q_quality_stats" -> (TextQueries.qualityStats _),
    "q_quality_score" -> (TextQueries.qualityScore _),
    "q_lang_id" -> (TextQueries.langId _),
    "q_fingerprint" -> (TextQueries.fingerprint _),
    // multimodal: real container decode (PPM/WAV/Y4M) + frame sampling
    "q_media_stats" -> (MediaQueries.mediaStats _),
    // similarity search
    "q_embed_topk" -> (EmbedQueries.bruteTopK _),
    "q_embed_lsh_topk" -> (EmbedQueries.lshTopK _),
    "q_embed_lsh_buckets" -> (EmbedQueries.lshBuckets _),
    "q_embed_ivf_topk" -> (EmbedQueries.ivfTopK _),
    "q_embed_neardup" -> (EmbedQueries.nearDupPairs _),
    "q_neardup_clusters" -> (EmbedQueries.nearDupClusters _),
    // format serde round-trips (reference task surface)
    "q_csv_roundtrip" -> (FormatQueries.csvRoundtripAgg _),
    "q_yaml_roundtrip" -> (FormatQueries.yamlRoundtripAgg _),
    "q_avro_roundtrip" -> (FormatQueries.avroRoundtripAgg _),
    "q_excel_roundtrip" -> (FormatQueries.excelRoundtripAgg _),
    "q_json_roundtrip" -> (FormatQueries.jsonRoundtripAgg _),
    "q_xml_roundtrip" -> (FormatQueries.xmlRoundtripAgg _),
    "q_toon_roundtrip" -> (FormatQueries.toonRoundtripAgg _),
    "q_protobuf_roundtrip" -> (FormatQueries.protobufRoundtripAgg _),
    "q_markdown_stats" -> (FormatQueries.markdownStats _),
    "q_infer_schema" -> (FormatQueries.inferredSchema _),
    "q_coerce_union" -> (FormatQueries.coerceUnion _),
    "q_serde_errors" -> (FormatQueries.serdeErrors _)
  )

  def oracleSql: Map[String, String] = Map(
    "q_stats_cols" ->
      """SELECT col_name, cnt, ndv, min_len, max_len, total_len FROM (
        |SELECT 'text' AS col_name, count(*) AS cnt, count(DISTINCT text) AS ndv,
        |  CAST(min(len(text)) AS BIGINT) AS min_len, CAST(max(len(text)) AS BIGINT) AS max_len,
        |  CAST(sum(len(text)) AS BIGINT) AS total_len FROM documents
        |UNION ALL
        |SELECT 'lang', count(*), count(DISTINCT lang), CAST(min(len(lang)) AS BIGINT),
        |  CAST(max(len(lang)) AS BIGINT), CAST(sum(len(lang)) AS BIGINT) FROM documents
        |UNION ALL
        |SELECT 'source', count(*), count(DISTINCT source), CAST(min(len(source)) AS BIGINT),
        |  CAST(max(len(source)) AS BIGINT), CAST(sum(len(source)) AS BIGINT) FROM documents)""".stripMargin,
    "q_skew_plan" ->
      """SELECT source, count(*) AS cnt, CAST(ceil(count(*)/25.0) AS BIGINT) AS n_buckets
        |FROM documents GROUP BY source""".stripMargin,
    "q_roundtrip_sha" ->
      """SELECT CAST(doc_id AS VARCHAR) AS doc_id_s, lang, source, sha256(text) AS h
        |FROM documents""".stripMargin,
    "q_point_lookup" ->
      """SELECT CAST(doc_id AS VARCHAR) AS doc_id_s, lang, source, sha256(text) AS h
        |FROM documents WHERE lang = 'en'""".stripMargin,
    "q_dsv2_lookup" ->
      """SELECT CAST(doc_id AS VARCHAR) AS doc_id_s, lang, source, sha256(text) AS h
        |FROM documents WHERE lang = 'en'""".stripMargin,
    "q_dsv2_agg" ->
      """SELECT min(CAST(doc_id AS VARCHAR)) AS mn_id, max(CAST(doc_id AS VARCHAR)) AS mx_id,
        |  min(text) AS mn_text, max(text) AS mx_text, count(*) AS n
        |FROM documents""".stripMargin,
    "q_key_lookup" ->
      """SELECT CAST(doc_id AS VARCHAR) AS doc_id_s,
        |  source || '/' || CAST(doc_id AS VARCHAR) AS doc_key, lang, sha256(text) AS h
        |FROM documents
        |WHERE source || '/' || CAST(doc_id AS VARCHAR) =
        |  (SELECT source || '/' || CAST(doc_id AS VARCHAR)
        |   FROM documents WHERE doc_id = 42)""".stripMargin,
    "q_compact_roundtrip" ->
      """SELECT lang, count(*) AS cnt, CAST(sum(len(text)) AS BIGINT) AS total_text_len
        |FROM documents GROUP BY lang""".stripMargin,
    "q_stream_roundtrip" ->
      """SELECT lang, count(*) AS cnt, CAST(sum(len(text)) AS BIGINT) AS total_text_len
        |FROM documents GROUP BY lang""".stripMargin,
    "q_topn" ->
      """SELECT CAST(doc_id AS VARCHAR) AS doc_id_s, lang, source, sha256(text) AS h
        |FROM documents
        |ORDER BY lang NULLS FIRST, source NULLS FIRST,
        |  CAST(doc_id AS VARCHAR) NULLS FIRST LIMIT 50""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(sum(l_quantity)*100) AS BIGINT) AS sum_qty_c,
        |  CAST(round(sum(l_extendedprice)*100) AS BIGINT) AS sum_price_c,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_join_revenue" ->
      """SELECT o_orderpriority,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
        |  CAST(round(sum(l_extendedprice*(1-l_discount))*100) AS BIGINT) AS revenue_c
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,
    "q_window_top_orders" ->
      """SELECT o_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
        |  FROM orders) t WHERE rnk <= 2""".stripMargin,
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  count(*) AS n, CAST(round(sum(value)*100) AS BIGINT) AS value_c
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_dedup_exact" ->
      """SELECT count(*) AS total_docs, count(DISTINCT text) AS distinct_texts,
        |  count(*) - count(DISTINCT text) AS dup_rows FROM documents""".stripMargin,
    "q_token_stats" ->
      """SELECT lang, count(*) AS docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY lang""".stripMargin,
    "q_quality_stats" ->
      """SELECT lang, CAST(sum(len(text)) AS BIGINT) AS chars,
        |  CAST(sum(len(regexp_replace(text, '[^a-zA-Z]', '', 'g'))) AS BIGINT) AS alpha_chars,
        |  CAST(sum(len(text) - len(replace(text, ' ', ''))) AS BIGINT) AS space_chars
        |FROM documents GROUP BY lang""".stripMargin,
    "q_excel_roundtrip" ->
      """SELECT lang, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang""".stripMargin,
    "q_quality_score" -> OracleSql.qualityScore,
    "q_ngram_jaccard" -> OracleSql.ngramJaccard(DedupQueries.ShingleDocFreqCap),
    "q_minhash_lsh" -> OracleSql.minhashLsh(
      DedupQueries.NumHashes, DedupQueries.NumBands, DedupQueries.BucketCap),
    "q_lang_id" -> OracleSql.langId,
    "q_fingerprint" -> OracleSql.fingerprint,
    "q_simhash" -> OracleSql.simhash,
    "q_media_stats" -> OracleSql.mediaStats,
    // pins the block cutter: single-partition blockRows=64 encode makes
    // n_blocks/n_rows/raw_bytes pure functions of the corpus (codec ids and
    // encoded sizes stay rows-only in q_encode_metrics by contract)
    "q_encode_blocks" ->
      """WITH vals AS (
        |  SELECT 'doc_id_s' AS col_name, CAST(doc_id AS VARCHAR) AS v FROM documents
        |  UNION ALL SELECT 'text', text FROM documents
        |  UNION ALL SELECT 'lang', lang FROM documents
        |  UNION ALL SELECT 'source', source FROM documents)
        |SELECT col_name,
        |  (count(*) + 63) // 64 AS n_blocks,
        |  count(*) AS n_rows,
        |  CAST(sum(strlen(v)) AS BIGINT) AS raw_bytes
        |FROM vals GROUP BY col_name ORDER BY col_name""".stripMargin,
    "q_embed_topk" -> OracleSql.embedTopK,
    "q_embed_lsh_topk" -> OracleSql.embedLshTopK(),
    "q_embed_lsh_buckets" -> OracleSql.embedLshBuckets(),
    "q_embed_ivf_topk" -> OracleSql.embedIvfTopK,
    "q_embed_neardup" -> OracleSql.embedNearDup(),
    "q_neardup_clusters" -> OracleSql.nearDupClusters(),
    "q_csv_roundtrip" ->
      """SELECT lang, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang""".stripMargin,
    "q_yaml_roundtrip" ->
      """SELECT source, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY source""".stripMargin,
    "q_avro_roundtrip" ->
      """SELECT lang, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang""".stripMargin,
    "q_json_roundtrip" -> OracleSql.langRoundtripWithTextLen,
    "q_xml_roundtrip" -> OracleSql.langRoundtripWithTextLen,
    "q_toon_roundtrip" -> OracleSql.langRoundtripWithTextLen,
    "q_protobuf_roundtrip" -> OracleSql.langRoundtripWithTextLen,
    "q_markdown_stats" ->
      """SELECT lang, count(*) AS docs,
        |  CAST(sum(len(lang) + 2 + len(text)) AS BIGINT) AS total_txt_len,
        |  CAST(sum(len(lang) + 2 + len(text)) AS BIGINT) AS total_rt_len
        |FROM documents GROUP BY lang""".stripMargin,
    "q_infer_schema" -> OracleSql.inferSchema,
    "q_serde_errors" -> OracleSql.serdeErrors,
    // pins CodecSelector's decision tree branch-by-branch (see
    // CoreQueries.codecDecisions — crafted probe distributions)
    "q_codec_decisions" ->
      """SELECT col_name, codec FROM (VALUES
        |  ('p_dict', 'dict'), ('p_dictrle', 'dictrle'), ('p_for', 'for'),
        |  ('p_fsst', 'fsst'), ('p_hex', 'hex'), ('p_plain', 'plain'),
        |  ('p_rle', 'rle')) AS t(col_name, codec)
        |ORDER BY col_name""".stripMargin,
    // mirrors FormatQueries.coerceUnion: the derived mixed-type cells are a
    // pure function of doc_id, so the union/WARN outcomes replay in SQL —
    // u: m=0 long "3d", m=1 double "(d%1e6).5" (bounded so Spark's double
    // rendering stays plain-decimal at any corpus), m=2 boolean → 'true',
    // m=3 null literal, m=4 string 'v'||d; qual: null (WARN) iff doc_id%7=3;
    // t_c0 computed from the id range (int vs bigint inference at scale)
    "q_coerce_union" ->
      """WITH d AS (
        |  SELECT doc_id, doc_id % 5 AS m,
        |    CASE doc_id % 5
        |      WHEN 0 THEN CAST(doc_id * 3 AS VARCHAR)
        |      WHEN 1 THEN CAST(doc_id % 1000000 AS VARCHAR) || '.5'
        |      WHEN 2 THEN 'true'
        |      WHEN 3 THEN NULL
        |      ELSE 'v' || CAST(doc_id AS VARCHAR) END AS u,
        |    CASE WHEN doc_id % 7 = 3 THEN NULL ELSE doc_id % 100 END AS qual
        |  FROM documents)
        |SELECT m AS case_id, count(*) AS cnt,
        |  CAST(sum(CASE WHEN u IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS union_nulls,
        |  CAST(sum(COALESCE(len(u), 0)) AS BIGINT) AS union_len,
        |  CAST(sum(doc_id % 1000000) AS BIGINT) AS sum_ids,
        |  CAST(sum(qual) AS BIGINT) AS sum_qual,
        |  CAST(sum(CASE WHEN qual IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS bad_cells,
        |  count(*) AS extra_nulls,
        |  'int' AS t_c0, 'string' AS t_c1, 'string' AS t_c2
        |FROM d GROUP BY m""".stripMargin
  )
}
