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
    // scale-adaptive spread: the signature pass is the per-row-heavy leg
    val docs = loadSpread(spark, sfDir, "documents", "doc_id")
    val sigs = minhashSignatures(docs).cache()
    val rowsPerBand = NumHashes / NumBands
    val bands = sigs.select(col("doc_id"),
      posexplode(
        transform(sequence(lit(0), lit(NumBands - 1)),
          b => arrayhash64(slice(col("mh"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .toDF("doc_id", "band", "band_hash")
    // bucket collect + cap check + pair expansion fused into ONE aggregate:
    // bounded_collect_long evals to NULL for buckets over BucketCap (the old
    // count-filter-join two-phase shape cost two extra stages and shipped
    // every bucket row into the count; the bounded buffer caps memory AND
    // shuffle at cap+1 longs per bucket per map partition — guide §2.3/§2.4)
    import graft.functions.boundedCollectFunctions.boundedCollectLong
    val candidates = bands.groupBy("band", "band_hash")
      .agg(boundedCollectLong(col("doc_id"), BucketCap).as("ids"))
      .where(col("ids").isNotNull && size(col("ids")) >= 2)
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
    // scale-adaptive spread: the shingling pass is the per-row-heavy leg
    val docs = loadSpread(spark, sfDir, "documents", "doc_id")
    // per-doc distinct shingles + set size, computed IN-ROW (the old
    // explode+distinct+groupBy shape shuffled every (doc, shingle) string
    // pair twice); sz rides along each shingle row so the pair expansion
    // below carries it — no sizes join afterwards
    // explode_outer, NOT explode: InferFiltersFromGenerate synthesizes a
    // size(sharr)>0 filter for a plain explode and pushes it below the
    // spread exchange — re-evaluating the whole shingling expression on
    // the pre-spread (single-task) side. Outer generate infers no filter;
    // the explicit isNotNull above the generate keeps the row set
    // identical (sharr always has >= 1 element by construction).
    val sh = docs
      .select(col("doc_id"), array_distinct(shingleArr).as("sharr"))
      .select(col("doc_id"), size(col("sharr")).cast("long").as("sz"),
        explode_outer(col("sharr")).as("shingle"))
      .where(col("shingle").isNotNull)
    // doc-frequency cap + (doc, size)-list collect + pair expansion fused
    // into ONE aggregate: bounded_collect_long_pair evals to NULL for
    // shingles above ShingleDocFreqCap — exactly the old heavy-set
    // anti-join semantics (drop ultra-common shingles before pairing) with
    // two fewer passes over `sh`, a cap+1-pairs-per-group memory/shuffle
    // bound at ANY corpus size (the old shape shipped every row of every
    // heavy shingle into the count), and the doc sizes carried through the
    // aggregate instead of TWO corpus-sized sizes joins at the end
    // (guide §2.3/§2.4, §8: move decisions onto small rows).
    import graft.functions.boundedCollectFunctions.boundedCollectLongPair
    val shared = sh.groupBy(col("shingle"))
      .agg(boundedCollectLongPair(col("doc_id"), col("sz"),
        ShingleDocFreqCap).as("ids"))
      .where(col("ids").isNotNull)
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a.k").as("doc_a"), col("a.v").as("sz_a"),
        explode(col("ids")).as("b"))
      .where(col("doc_a") < col("b.k"))
      .groupBy(col("doc_a"), col("b.k").as("doc_b"),
        col("sz_a"), col("b.v").as("sz_b"))
      .agg(count(lit(1)).as("shared"))
    // integer outputs (shared / sizes / basis-point jaccard by integer
    // division) hash identically in any engine; the double is ORDER-only
    shared
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
