package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis suite over `documents`: token counting, quality scoring
  * (integer char-class counts → DuckDB-checkable), n-gram language ID, and
  * rolling-hash fingerprints. Per-doc ops are narrow (no shuffle).
  */
object TextQueries {
  import Tables._

  /** whitespace token counts per lang (oracle-checkable) */
  def tokenStats(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(size(split(col("text"), " "))).cast("long").as("total_tokens"))

  /** quality signals as integer char-class sums per lang (oracle-checkable) */
  def qualityStats(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "documents")
      .groupBy(col("lang"))
      .agg(
        sum(length(col("text"))).cast("long").as("chars"),
        sum(length(regexp_replace(col("text"), "[^a-zA-Z]", "")))
          .cast("long").as("alpha_chars"),
        sum(length(col("text")) - length(regexp_replace(col("text"), " ", "")))
          .cast("long").as("space_chars"))

  /** per-doc quality score (length / stopword ratio / mean token length).
    * Ratios are emitted as integer basis points via integer division —
    * engine-independent for the DuckDB hash compare (no FP rounding rules).
    */
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "on")
    val toks = split(col("text"), " ")
    val stopHits = aggregate(
      transform(toks, t => when(t.isin(stopwords.map(lit): _*), 1).otherwise(0)),
      lit(0), _ + _)
    load(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(toks).cast("long").as("n_tokens"),
        stopHits.cast("long").as("stop_hits"))
      .select(col("doc_id"), col("n_chars"), col("n_tokens"), col("stop_hits"),
        expr("(10000 * stop_hits) DIV n_tokens").as("stopword_bp"),
        expr("(100 * n_chars) DIV n_tokens").as("mean_token_len_c"))
      .orderBy("doc_id")
  }

  /** character-trigram language ID: per-language profiles are learned from
    * the labeled corpus itself (top trigrams per lang), then every doc is
    * scored against each profile — confusion matrix out. The profile build
    * is a broadcast-sized aggregate; scoring is a broadcast join.
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame =
    // scale-adaptive spread: trigram extraction is the per-row-heavy leg
    langIdImpl(loadSpread(spark, sfDir, "documents", "doc_id"))

  private def langIdImpl(docs: DataFrame): DataFrame = {
    // per-doc trigram COUNTS (one HashMap per doc inside the codegen'd
    // TrigramCounts expression): the shuffle carries one row per distinct
    // trigram per doc, not one row per trigram POSITION — and the
    // projection stays inside WholeStageCodegen (the prior typed flatMap
    // paid an encoder ser/de round-trip per output row). Extraction is
    // CODEPOINT-windowed exactly like before: the oracle slices
    // `text[i:i+2]` by codepoint.
    // explode_outer, NOT explode: InferFiltersFromGenerate would
    // synthesize a size(trigram_counts(text))>0 filter and push it below
    // the spread exchange, re-running the trigram extraction on the
    // pre-spread single-task side. Outer generate infers no filter; the
    // explicit isNotNull above the generate drops exactly the rows plain
    // explode dropped (docs under 3 codepoints emit one null tc row).
    val tri = docs
      .select(col("lang"), col("doc_id"),
        explode_outer(graft.functions.textFunctions.trigramCounts(col("text"))).as("tc"))
      .where(col("tc").isNotNull)
      .select(col("lang"), col("doc_id"),
        col("tc.tri").as("tri"), col("tc.cnt").as("cnt"))
      // consumed twice (profile build + scoring join): cache so the per-doc
      // trigram pass — the expensive part — runs once, not twice
      .cache()
    // two-phase top-k profile build: a single window partitioned by lang
    // would funnel every distinct (lang, trigram) row of a language through
    // ONE reducer task (~25 tasks total at any corpus size). Phase 1 takes a
    // partial top-50 per (lang, shard-of-trigram) — exact, because the
    // ordering (c desc, tri) is total, so each global top-50 trigram ranks
    // <=50 inside its own shard. Phase 2 merges at most shards*50 rows per
    // lang — bounded regardless of corpus size.
    // Phase 1 is a bounded top-k AGGREGATE (bounded_topk_by_count), not a
    // row_number window: the same rnk<=50 row set under the identical
    // (c desc, tri) order, but with map-side partial top-k — the shuffle
    // carries <=~2x50 rows per (lang, shard) per map partition instead of
    // EVERY distinct trigram row into a sort (guide §2.3).
    val profileShards = 64
    val triCounts = tri.groupBy("lang", "tri").agg(sum(col("cnt")).as("c"))
    val partialTop = triCounts
      .withColumn("shard", pmod(hash(col("tri")), lit(profileShards)))
      .groupBy("lang", "shard")
      .agg(graft.functions.boundedCollectFunctions
        .boundedTopKByCount(col("c"), col("tri"), 50).as("top"))
      .select(col("lang"), explode_outer(col("top")).as("t"))
      .where(col("t").isNotNull)
      .select(col("lang"), col("t.tri").as("tri"), col("t.c").as("c"))
    val profiles = partialTop
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("c").desc, col("tri"))))
      .where(col("rnk") <= 50)
      .select(col("lang").as("profile_lang"), col("tri"))
    // per-doc argmax profile via min(struct(-c, profile_lang)) — the same
    // winner as the old row_number window (ORDER BY c DESC, profile_lang:
    // lang is functionally determined by doc_id so the extra group key
    // changes nothing), but as a partial-aggregating hash agg instead of a
    // full sort window over every (doc, profile) score (guide §2.3/§2.4)
    val best = tri.select(col("doc_id"), col("lang"), col("tri"), col("cnt"))
      .join(broadcast(profiles), Seq("tri"))
      .groupBy("doc_id", "lang", "profile_lang").agg(sum(col("cnt")).as("c"))
      .groupBy("doc_id", "lang")
      .agg(min(struct((-col("c")).as("nc"), col("profile_lang").as("pl"))).as("w"))
    best.groupBy(col("lang"), col("w.pl").as("guessed"))
      .agg(count(lit(1)).as("docs"))
      .orderBy("lang", "guessed")
  }

  /** rolling-hash (Rabin–Karp, window 16 chars) min-fingerprint per doc —
    * a codegen'd Catalyst expression projection (functions.RollingMinHash64),
    * not a typed Dataset.map: no encoder ser/de per row, the whole
    * projection stays inside WholeStageCodegen. %016x formatting matches
    * the previous Scala f-interpolator exactly (java.util.Formatter on
    * both paths), so OracleSql.fingerprint is untouched.
    */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "documents")
      .select(col("doc_id"),
        format_string("%016x",
          graft.functions.textFunctions.rollingMinHash64(col("text"), 16))
          .as("fingerprint_hex"))
      .orderBy("doc_id")

  /** the fingerprint kernel (delegates to the expression's shared impl) */
  def rollingMinHash(text: String, window: Int): Long =
    graft.functions.RollingHashImpl.minHashString(text, window)
}
