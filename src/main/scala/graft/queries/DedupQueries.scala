package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication suite over the `documents` table — exact, MinHash+LSH,
  * SimHash, and exact n-gram Jaccard. All shapes are the 100 TB-scale ones:
  * narrow maps for per-doc signatures, band-bucket joins (never all-pairs)
  * for candidates, and mega-bucket capping so a degenerate shingle cannot
  * explode the pair count.
  */
object DedupQueries {
  import Tables._

  val NumHashes = 32
  val NumBands = 8 // × 4 rows per band
  val BucketCap = 200 // drop degenerate LSH buckets larger than this

  /** exact duplication profile (hash-groupBy semantics, 1 summary row).
    * Distinct runs over sha2(text) — identical counts (barring a 2^-256
    * collision) while shuffling 64 hex chars per row instead of whole
    * documents; at 100 TB the difference is the job.
    */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "documents").agg(
      count(lit(1)).as("total_docs"),
      countDistinct(sha2(col("text"), 256)).as("distinct_texts"),
      (count(lit(1)) - countDistinct(sha2(col("text"), 256))).as("dup_rows"))

  /** per-row word-3-shingle array (short docs fall back to whole text) —
    * the shared shingling expression; ngramJaccard/minhashSignatures both
    * derive from it so the two pipelines stay definitionally identical
    */
  private def shingleArr: org.apache.spark.sql.Column = {
    val toks = split(col("text"), " ")
    when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** per-doc MinHash signature (NumHashes seeded mins) as array. The hash
    * is graft's native seedhash64 (polynomial-31 + murmur fmix64) rather
    * than xxhash64 because the WHOLE minhash pipeline must be replayable in
    * the DuckDB oracle — seedhash64 is exactly expressible in HUGEINT
    * mod-2^64 SQL (OracleSql.minhashLsh); xxhash64's striped rotations are
    * not. Same codegen'd-expression performance class.
    *
    * Computed NARROWLY: min over a doc's shingle multiset equals min over
    * its distinct set, so the signature is array_min over the in-row
    * shingle array — the old explode + groupBy(doc_id) shuffled every
    * shingle string and funneled them back per doc; this shape shuffles
    * nothing (guide §2.4). The seed-independent polynomial term is hashed
    * once per shingle (polyhash64) and mixed per seed (mixhash64 with the
    * plan-constant fmix64(seed*Golden)) — bit-identical to seedhash64 by
    * definition, one string scan instead of NumHashes.
    */
  private def minhashSignatures(docs: DataFrame): DataFrame = {
    import graft.functions.minhashFunctions.{mixhash64, polyhash64}
    import graft.functions.MinHashImpl
    docs
      .select(col("doc_id"),
        transform(shingleArr, s => polyhash64(s)).as("polys"))
      .select(col("doc_id"),
        array((0 until NumHashes).map(k =>
          array_min(transform(col("polys"),
            p => mixhash64(p, lit(MinHashImpl.seedMix(k.toLong)))))): _*).as("mh"))
  }

  /** MinHash + LSH banding: candidate pairs with signature match counts.
    * Self-join on (band, band-hash) — only same-bucket pairs are formed,
    * with buckets above BucketCap dropped (skew guard). `matches` (0..32
    * equal signature positions, est. Jaccard = matches/32) is an integer,
    * so the DuckDB oracle hash-compares exactly.
    */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.minhashFunctions.arrayhash64
    val docs = load(spark, sfDir, "documents")
    val sigs = minhashSignatures(docs).cache()
    val rowsPerBand = NumHashes / NumBands
    val bands = sigs.select(col("doc_id"),
      posexplode(
        transform(sequence(lit(0), lit(NumBands - 1)),
          b => arrayhash64(slice(col("mh"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .toDF("doc_id", "band", "band_hash")
    val okBuckets = bands.groupBy("band", "band_hash").count()
      .where(col("count") <= BucketCap && col("count") >= 2)
      .drop("count")
    val inBuckets = bands.join(okBuckets, Seq("band", "band_hash"))
    // pair generation: ONE groupBy per bucket (reuses the join's
    // (band, band_hash) partitioning — no new exchange) + in-row pair
    // expansion, instead of the old two-sided self-join that shuffled
    // inBuckets twice more. collect_list is safe here BECAUSE it runs after
    // the BucketCap filter: every group holds <= BucketCap ids (guide §2.4).
    val candidates = inBuckets.groupBy("band", "band_hash")
      .agg(collect_list(col("doc_id")).as("ids"))
      .select(explode(col("ids")).as("doc_a"), col("ids"))
      .select(col("doc_a"), explode(col("ids")).as("doc_b"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    candidates
      .join(sigs.select(col("doc_id").as("doc_a"), col("mh").as("mh_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("mh").as("mh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        aggregate(zip_with(col("mh_a"), col("mh_b"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), _ + _)
          .cast("long").as("matches"))
      .orderBy(col("matches").desc, col("doc_a"), col("doc_b"))
      .limit(100)
  }

  /** 64-bit SimHash per doc — runs through the native codegen'd Catalyst
    * expression (graft.functions.SimHash64), staying inside whole-stage
    * codegen with no serialization boundary
    */
  def simhash(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "documents")
      .select(col("doc_id"),
        lpad(hex(graft.functions.functions.simhash64(col("text"))), 16, "0")
          .as("simhash_hex"))
      .withColumn("simhash_hex", lower(col("simhash_hex")))
      .orderBy("doc_id")

  /** A shingle appearing in k docs contributes k² rows to the self-join:
    * one boilerplate phrase across 10⁶ docs is 10¹² rows. Shingles above
    * this doc-frequency are dropped before the join (the standard guard —
    * they carry ~zero Jaccard signal anyway); `shared` is then a lower
    * bound for pairs sharing ultra-common shingles, exact otherwise.
    */
  val ShingleDocFreqCap = 100

  /** n-gram Jaccard via shingle-join (never all-pairs), capped as above */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = load(spark, sfDir, "documents")
    // per-doc distinct shingle ARRAYS, cached once: sizes come straight off
    // the array (narrow — the old groupBy(doc_id) count shuffled every
    // (doc, shingle) pair a second time), and the exploded view feeds the
    // doc-frequency pass (guide §2.4)
    val perDoc = docs
      .select(col("doc_id"), array_distinct(shingleArr).as("sharr")).cache()
    val sh = perDoc.select(col("doc_id"), explode(col("sharr")).as("shingle"))
    val sizes = perDoc.select(col("doc_id"), size(col("sharr")).cast("long").as("sz"))
    // the HEAVY set is small relative to `sh` but its bound is
    // totalShingles/cap — ~1% of all (doc,shingle) rows, which at 100 TB is
    // tens of millions of strings: too big to FORCE into a broadcast. No
    // hint: size-based planning (and AQE at runtime) broadcasts while it
    // fits and degrades to a shuffled anti-join instead of OOMing.
    val heavy = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .where(col("df") > ShingleDocFreqCap)
      .select("shingle")
    val pruned = sh.join(heavy, Seq("shingle"), "left_anti")
    // pair generation: group each surviving shingle's doc list and expand
    // pairs IN-ROW — the old two-sided self-join shuffled pruned twice by
    // shingle; one groupBy moves each (doc, shingle) row once. collect_list
    // is bounded by construction: the anti-join above removed every shingle
    // with doc-frequency > ShingleDocFreqCap, so no group exceeds the cap.
    val shared = pruned.groupBy(col("shingle"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .select(explode(col("ids")).as("doc_a"), col("ids"))
      .select(col("doc_a"), explode(col("ids")).as("doc_b"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared"))
    // integer outputs (shared / sizes / basis-point jaccard by integer
    // division) hash identically in any engine; the double is ORDER-only
    shared
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("shared"),
        col("sz_a"), col("sz_b"),
        expr("(10000 * shared) DIV (sz_a + sz_b - shared)").as("jac_bp"),
        (col("shared").cast("double") /
          (col("sz_a") + col("sz_b") - col("shared"))).as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(50)
      .drop("jaccard")
  }
}
