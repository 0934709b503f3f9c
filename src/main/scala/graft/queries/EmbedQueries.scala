package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float], dim 64):
  * brute-force cosine top-k as the correctness baseline, and a seeded
  * random-hyperplane LSH-bucketed variant as the scale path (candidates
  * come from a bucket join, never a full cross product).
  */
object EmbedQueries {
  import Tables._

  val K = 5
  val NumQueries = 10
  /** independent hash tables (bands) — a pair is a candidate if it collides
    * in ANY band, so recall compounds across bands
    */
  val LshBands = 4
  /** desired mean bucket population; bits per band are derived from corpus
    * size so buckets stay this size at ANY scale (256 fixed buckets would
    * hold corpus/256 rows each at 100 TB — the join would degenerate)
    */
  val LshTargetBucket = 32
  /** hard per-bucket cap (skew guard, mirrors DedupQueries.BucketCap) */
  val LshBucketCap = 8 * LshTargetBucket

  /** bits-per-band cap — the ONE constant the oracle's literal planes
    * table must cover (OracleSql.embedLshCommon requires maxBits >= this)
    */
  val MaxLshBits = 24

  /** bits per band for a corpus of n vectors: 2^bits ≈ n / targetBucket.
    * Pure integer arithmetic (ceil-div + bit length) so the DuckDB oracle
    * computes the IDENTICAL value — float log2 can differ by 1 ulp at
    * power-of-two boundaries and flip the ceil.
    */
  def lshBitsFor(n: Long): Int = {
    val m = (math.max(1L, n) + LshTargetBucket - 1) / LshTargetBucket
    val bitLen = 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    math.min(MaxLshBits, math.max(4, bitLen))
  }

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding"),
      sqrt(aggregate(transform(col("embedding"), x => x.cast("double") * x),
        lit(0.0), _ + _)).as("norm"))

  /** Exact cosine with the zero-norm guard (repo invariant): a zero norm
    * product makes 0/0 = NaN, which Spark/DuckDB ORDER BY ranks GREATEST
    * while the JVM ranks it last, and round(NaN).cast(long) throws under
    * ANSI — pin the degenerate case to -1 on BOTH sides (every OracleSql
    * cosine carries the matching CASE).
    */
  private def cosine(a: String, b: String): org.apache.spark.sql.Column = {
    val den = col(s"$a.norm") * col(s"$b.norm")
    when(den === 0, lit(-1.0)).otherwise(
      aggregate(zip_with(col(s"$a.embedding"), col(s"$b.embedding"),
        (x, y) => x.cast("double") * y), lit(0.0), _ + _) / den)
  }

  /** corpus row count, memoized per (sfDir, JVM) in Tables.rowCount: five
    * embed queries size bits/cells from it and Bench re-runs each query
    * twice — without the memo every run pays one redundant count job
    */
  private def corpusCount(spark: SparkSession, sfDir: String): Long =
    Tables.rowCount(spark, sfDir, "embeddings")

  /** brute-force cosine top-k for the first NumQueries vectors (baseline):
    * small query side broadcast against the full corpus.
    */
  def bruteTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val vecs = withNorm(loadSpread(spark, sfDir, "embeddings", "vec_id"))
    val queries = vecs.where(col("vec_id") < NumQueries)
    val joined = vecs.as("c").join(
      broadcast(queries.as("q")), col("q.vec_id") =!= col("c.vec_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    joined
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine("q", "c").as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= K)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos") * 1000000).cast("long").as("cos_r6"))
      .orderBy("query_id", "rnk")
  }

  /** seeded deterministic hyperplane weight for (plane, dim) — read by the
    * BandSignatures64 expression (graft.functions.EmbedExprs)
    */
  private[graft] def planeWeight(p: Int, j: Int): Double = {
    var z = p.toLong * 131071L + j + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= (z >>> 31)
    // map to [-1, 1)
    (z >>> 11).toDouble / (1L << 52).toDouble - 1.0
  }

  /** (vec_id, band, sig) — LshBands independent sign-random-projection
    * signatures per vector; band b uses planes [b*bits, (b+1)*bits).
    * Computed by the codegen'd BandSignatures64 expression (identical
    * fixed-order arithmetic, NaN-proof sign test — see
    * graft.functions.EmbedExprs); the prior typed flatMap paid an encoder
    * ser/de round-trip (Seq[Float] boxing) per vector.
    */
  private def bandSignatures(df: DataFrame, bits: Int): DataFrame =
    // posexplode_outer, NOT posexplode: InferFiltersFromGenerate would
    // synthesize a size(bandsigs64(embedding))>0 filter and push it below
    // the spread exchange, re-running the signature dot products on the
    // pre-spread single-task side. Outer generate infers no filter; the
    // explicit isNotNull keeps the row set identical (the signature array
    // always has LshBands elements).
    df.select(col("vec_id"),
      posexplode_outer(graft.functions.embedFunctions.bandSigs64(
        col("embedding"), LshBands, bits)))
      .toDF("vec_id", "band", "sig")
      .where(col("sig").isNotNull)

  /** Multi-band LSH ANN: candidates = union over bands of same-bucket
    * pairs (bucket-capped), then exact cosine re-rank. Bits per band scale
    * with corpus size so each bucket holds ~LshTargetBucket vectors at any
    * scale; the bucket join is therefore bounded at 100× — never corpus/256.
    */
  def lshTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val base = loadSpread(spark, sfDir, "embeddings", "vec_id").select(col("vec_id"), col("embedding"))
    val n = corpusCount(spark, sfDir)
    val bits = lshBitsFor(n)
    val bands = bandSignatures(base, bits)
    // bucket collect + cap check + (query, member) expansion fused into ONE
    // aggregate: bounded_collect_long evals to NULL for buckets over
    // LshBucketCap (the old count-filter-join shape cost two extra stages;
    // the bounded buffer caps memory and shuffle at cap+1 longs per bucket
    // per map partition — guide §2.3/§2.4)
    import graft.functions.boundedCollectFunctions.boundedCollectLong
    val candidates = bands.groupBy("band", "sig")
      .agg(boundedCollectLong(col("vec_id"), LshBucketCap).as("ids"))
      .where(col("ids").isNotNull && size(col("ids")) >= 2)
      .select(filter(col("ids"), x => x < NumQueries).as("qids"), col("ids"))
      .select(explode(col("qids")).as("query_id"), col("ids"))
      .select(col("query_id"), explode(col("ids")).as("neighbor_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    rerankTopK(candidates, base)
  }

  /** probed cells per query in the IVF variant */
  val IvfProbe = 4

  /** IVF cell count ≈ sqrt(corpus): 2^(bitlen(n)/2), clamped. Integer
    * bit-length arithmetic so the DuckDB oracle computes the IDENTICAL
    * value (`length(printf('%b', n))`).
    */
  def ivfCellsFor(n: Long): Int = {
    val bitLen = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n))
    // Long shift: an Int `1 << 31` would wrap negative (SQL shifts BIGINT)
    math.min(4096L, math.max(8L, 1L << (bitLen / 2))).toInt
  }

  /** exact cosine re-rank of a (query_id, neighbor_id) candidate set —
    * the shared tail of every ANN variant
    */
  private def rerankTopK(candidates: DataFrame, base: DataFrame): DataFrame = {
    val vecs = withNorm(base)
    val joined = candidates
      .join(broadcast(vecs.select(col("vec_id").as("query_id"),
        col("embedding"), col("norm")).where(col("query_id") < NumQueries)
        .as("q")), Seq("query_id"))
      .join(vecs.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("n_embedding"), col("norm").as("n_norm")),
        Seq("neighbor_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    val den = col("norm") * col("n_norm")
    joined
      .select(col("query_id"), col("neighbor_id"),
        when(den === 0, lit(-1.0)).otherwise(
          aggregate(zip_with(col("embedding"), col("n_embedding"),
            (x, y) => x.cast("double") * y), lit(0.0), _ + _) / den).as("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= K)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        round(col("cos") * 1000000).cast("long").as("cos_r6"))
      .orderBy("query_id", "rnk")
  }

  /** IVF-flat ANN: ~sqrt(n) anchor vectors (the first `cells` corpus
    * vectors) partition the corpus into cells by max-cosine assignment —
    * computed as a NARROW map against the broadcast anchor array, never an
    * n×cells join. Queries probe their IvfProbe closest cells; candidates
    * are the members of probed cells (cells over 8× the expected
    * population are dropped — the skew guard), then exact cosine re-rank.
    * At 100 TB the costs stay bounded: anchors are O(sqrt n) broadcast
    * metadata, assignment is one narrow pass (cells×dim flops/row), and
    * the candidate join is probes×cell-size, never corpus².
    * All assignment arithmetic is fixed-order double — the DuckDB oracle
    * replays it exactly.
    */
  def ivfTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // plain load, no spread: the assignment pass is ~cells×dim flops/row —
    // light enough at driver scale that the spread exchange cost more than
    // the parallelism bought (measured 0.55 s unspread vs 0.75–0.95 s
    // spread); at 100 TB the spread would be a no-op anyway (enough scan
    // splits), so this changes nothing at scale
    val base = load(spark, sfDir, "embeddings").select(col("vec_id"), col("embedding"))
    val nTotal = corpusCount(spark, sfDir)
    val cells = ivfCellsFor(nTotal)
    val cellCap = 8L * ((nTotal + cells - 1) / cells)
    // anchors: O(sqrt n) — driver-side metadata, like the skew plan.
    // Collected from the PLAIN load, not the spread `base`: a bounded
    // driver collect gains nothing from executor parallelism and would
    // otherwise pay the spread exchange as its own extra job.
    val anchors: Array[(Int, Array[Double], Double)] = load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .where(col("vec_id") < cells)
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
      .map { case (id, emb) =>
        val a = emb.toArray.map(_.toDouble)
        var nrm = 0.0
        var j = 0
        while (j < a.length) { nrm += a(j) * a(j); j += 1 }
        (id.toInt, a, math.sqrt(nrm))
      }
    val bc = spark.sparkContext.broadcast(anchors)
    val nQ = NumQueries
    val nProbe = IvfProbe
    // one narrow pass: per vector its argmax cell; per query the top
    // nProbe cells. kind 0 = assignment row, kind 1 = probe row.
    val assignedAndProbes = base.as[(Long, Seq[Float])]
      .flatMap { case (id, emb) =>
        val v = emb.toArray
        var nrm = 0.0
        var j = 0
        while (j < v.length) { nrm += v(j).toDouble * v(j).toDouble; j += 1 }
        val vNorm = math.sqrt(nrm)
        val as = bc.value
        val cos = new Array[Double](as.length)
        var i = 0
        while (i < as.length) {
          val (_, a, aNorm) = as(i)
          var dot = 0.0
          j = 0
          while (j < a.length && j < v.length) { dot += v(j).toDouble * a(j); j += 1 }
          // a zero-norm vector or anchor makes 0/0 = NaN, and JVM argmax
          // (NaN loses every >) would diverge from the oracle's ORDER BY
          // (DuckDB sorts NaN greatest) — pin the degenerate case to -1 on
          // BOTH sides (OracleSql mirrors this CASE) so it sorts last
          val den = vNorm * aNorm
          cos(i) = if (den == 0) -1.0 else dot / den
          i += 1
        }
        // argmax, ties to the smaller cell id (ascending scan, strict >)
        var best = 0
        i = 1
        while (i < cos.length) { if (cos(i) > cos(best)) best = i; i += 1 }
        val assignRow = Iterator.single((0, id, as(best)._1))
        if (id >= nQ) assignRow
        else assignRow ++ cos.indices
          // IEEE comparisons (±0.0 equal → cell-id tiebreak), matching the
          // oracle's ORDER BY cos DESC, cell_id — a (-cos, id) sortBy key
          // would rank -0.0 below +0.0 under Scala's total ordering
          .sortWith((a, b) => cos(a) > cos(b) ||
            (cos(a) == cos(b) && as(a)._1 < as(b)._1))
          .take(nProbe)
          .iterator.map(i => (1, id, as(i)._1))
      }
      .toDF("kind", "vec_id", "cell_id")
      // the assignment pass is the dominant cost (cells×dim flops per
      // row) and feeds three consumers — persist its narrow output so the
      // pass runs once, not per action
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val assigned = assignedAndProbes.where(col("kind") === 0)
      .select(col("vec_id").as("neighbor_id"), col("cell_id"))
    val okCells = assigned.groupBy("cell_id")
      .agg(count(lit(1)).as("csz")).where(col("csz") <= cellCap)
      .select("cell_id")
    val probes = assignedAndProbes.where(col("kind") === 1)
      .select(col("vec_id").as("query_id"), col("cell_id"))
    val candidates = assigned
      .join(broadcast(okCells), Seq("cell_id"))
      .join(broadcast(probes), Seq("cell_id"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
    rerankTopK(candidates, base)
  }

  /** global pairs reported by the near-dup query */
  val NearDupTopN = 50

  /** Embedding-cosine near-duplicate detection: candidate pairs = pairs
    * sharing any capped LSH bucket (id_a < id_b so each pair appears
    * once), exact cosine re-rank, global top-NearDupTopN. The candidate
    * set is bounded by bands × buckets × cap² at ANY corpus size (bits
    * scale with n), and the global top-N is a TakeOrdered, not a full
    * sort — the rank window runs AFTER the limit, over ≤ NearDupTopN
    * rows. The dedup-pipeline complement of lshTopK's per-query search.
    */
  /** capped-bucket candidate pairs (id_a < id_b, each pair once) — shared
    * by the near-dup pair report and the clustering query
    */
  private def candidatePairs(base: DataFrame, n: Long): DataFrame = {
    val bands = bandSignatures(base, lshBitsFor(n))
    // bucket collect + cap check + pair expansion fused into ONE aggregate:
    // bounded_collect_long evals to NULL for buckets over LshBucketCap (the
    // old count-filter-join two-phase shape cost two extra stages; the
    // bounded buffer caps memory and shuffle at cap+1 longs per bucket per
    // map partition — guide §2.3/§2.4)
    import graft.functions.boundedCollectFunctions.boundedCollectLong
    bands.groupBy("band", "sig")
      .agg(boundedCollectLong(col("vec_id"), LshBucketCap).as("ids"))
      .where(col("ids").isNotNull && size(col("ids")) >= 2)
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Scored candidate-pair graph (id_a, id_b, cos) materialized ONCE per
    * (sfDir, JVM): the near-dup pair report and the clustering both
    * consume the same edges — a dedup pipeline materializes this graph
    * once, not per downstream consumer. The cosine is stored as the
    * double the JVM computed (parquet round-trips doubles exactly), so
    * every downstream comparison/rounding sees bit-identical values to
    * recomputing. Holder discipline mirrors CoreQueries.docStore: the
    * build runs in the holder's lazy val, NOT inside a CHM compute (which
    * would hold the bin lock across a multi-second Spark job); a dangling
    * entry (scratch dir swept externally) drops and rebuilds.
    */
  private final class GraphHolder(mk0: () => String) {
    // drop the builder closure once it has run: it captures the building
    // session's plan graph (SparkSession, DataFrames), which must not stay
    // reachable from this JVM-lifetime CHM entry after the one-shot build.
    // A build that THROWS leaves mk set — lazy val re-evaluates next call.
    private var mk = mk0
    lazy val dir: String = { val d = mk(); mk = null; d }
  }
  private val pairGraphStore =
    new java.util.concurrent.ConcurrentHashMap[String, GraphHolder]()
  @annotation.tailrec
  private def scoredPairGraph(spark: SparkSession, sfDir: String,
      attempt: Int = 0): DataFrame = {
    // a committed write without _SUCCESS is not a sweep race but a
    // committer configured to skip markers (marksuccessfuljobs=false) —
    // retrying would rebuild the full LSH+join job forever
    require(attempt < 3, s"pair-graph parquet for $sfDir repeatedly " +
      "committed without _SUCCESS — committer writes no success markers?")
    val h = pairGraphStore.computeIfAbsent(sfDir, _ => new GraphHolder(() => {
      val dir = Tables.scratchDir("graft-q-pairgraph")
      val base = loadSpread(spark, sfDir, "embeddings", "vec_id").select(col("vec_id"), col("embedding"))
      val n = corpusCount(spark, sfDir)
      val vecs = withNorm(base)
      candidatePairs(base, n)
        .join(vecs.as("va"), col("id_a") === col("va.vec_id"))
        .join(vecs.as("vb"), col("id_b") === col("vb.vec_id"))
        .select(col("id_a"), col("id_b"), cosine("va", "vb").as("cos"))
        .write.mode("overwrite").parquet(dir)
      dir
    }))
    val d = h.dir // first caller builds here; others block on the holder only
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(d, "_SUCCESS")))
      spark.read.parquet(d)
    else {
      pairGraphStore.remove(sfDir, h)
      scoredPairGraph(spark, sfDir, attempt + 1)
    }
  }

  def nearDupPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = scoredPairGraph(spark, sfDir)
    val top = scored
      .orderBy(col("cos").desc, col("id_a"), col("id_b")).limit(NearDupTopN)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cos").desc, col("id_a"), col("id_b"))
    top.withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("id_a"), col("id_b"), col("rnk"),
        round(col("cos") * 1000000).cast("long").as("cos_r6"))
      .orderBy("rnk")
  }

  /** clustering threshold on exact cosine — ORACLE-COUPLED
    * (OracleSql.nearDupClusters replays the comparison; the synthetic
    * embeddings' candidate cosines top out around 0.49, so 0.40 yields
    * non-trivial clusters at every driver scale)
    */
  val ClusterTau = 0.40

  /** Near-duplicate CLUSTERS: connected components over the graph of
    * capped-bucket candidate pairs whose exact cosine >= ClusterTau,
    * labels = min vec_id of the component (the canonical representative a
    * dedup pipeline keeps). Computed by min-label propagation to fixpoint:
    * each round is one hash join + one aggregate over the thresholded pair
    * graph — the graph is bounded by the LSH caps at ANY corpus size, and
    * rounds are bounded by the largest component's diameter (near-dup
    * components are short chains in practice). localCheckpoint truncates
    * the plan between rounds so lineage stays O(1) instead of O(rounds).
    * Exactly mirrored by the oracle's recursive reachability closure
    * (validated in tools/oracle_proto7.py).
    */
  def nearDupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    // the stored cos carries the zero-norm -1 pin mirroring the oracle's CASE
    val pairs = scoredPairGraph(spark, sfDir)
      .where(col("cos") >= ClusterTau)
      .select(col("id_a"), col("id_b"))
      .persist()
    // partitioning ADAPTED to the measured graph size: the thresholded
    // pair graph is tiny at driver scale (a handful of tasks per round
    // instead of 32 nearly-empty ones) and grows with the corpus at 100×
    // (~500k edges per partition, capped at the executor parallelism)
    val nEdges = pairs.count()
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, nEdges / 500000L + 1)).toInt
    val verts = pairs.select(col("id_a").as("v"))
      .union(pairs.select(col("id_b").as("v"))).distinct()
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .repartition(parts, col("src"))
      .persist()
    // ONE Spark job per propagation round: the new labels are a LAZY
    // localCheckpoint (lineage truncation without an extra materialization
    // job), and convergence is read off the same action that materializes
    // them — labels only ever DECREASE, so the label sum (exact in
    // decimal(38), sums of 64-bit ids cannot overflow it) is strictly
    // monotone and a fixpoint is exactly "sum unchanged"
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("lbl").cast("decimal(38,0)"))).first().getDecimal(0)
    var labels = verts.select(col("v"), col("v").as("lbl"))
      .repartition(parts, col("v")).localCheckpoint()
    var prevSum = labelSum(labels)
    var converged = prevSum == null // empty graph: nothing to propagate
    var iter = 0
    // one propagation step: join + min-aggregate. The repartition to
    // `parts` BEFORE the aggregate matters: groupBy alone would land on
    // spark.sql.shuffle.partitions, and the next step's join against
    // `edges` (partitioned to `parts` by src) would then have to
    // re-exchange BOTH sides every step. HashPartitioning(v, parts)
    // satisfies the aggregate's distribution (no extra exchange) and
    // matches the join's layout — one exchange per step instead of three
    // (guide §2.4).
    def step(labels: DataFrame): DataFrame = {
      val prop = edges.join(labels, col("src") === col("v"))
        .select(col("dst").as("v"), col("lbl"))
      labels.select(col("v"), col("lbl")).union(prop)
        .repartition(parts, col("v"))
        .groupBy("v").agg(min(col("lbl")).as("lbl"))
    }
    while (!converged) {
      iter += 1
      // diameter bound: min-label propagation converges in O(diameter)
      // rounds; 64 doubled rounds of shrinking labels means a pathological
      // graph, not slow convergence — fail loudly rather than loop
      require(iter <= 64, "near-dup label propagation did not converge")
      // TWO propagation steps per Spark job (one lazy localCheckpoint +
      // one labelSum action cover both): halves the per-round driver/job
      // overhead; the fixpoint test is unchanged because the label sum is
      // strictly monotone decreasing — it is unchanged after a double step
      // iff it is unchanged after each step — at the cost of at most one
      // redundant propagation over already-final labels
      val next = step(step(labels)).localCheckpoint(eager = false)
      val s = labelSum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
    }
    edges.unpersist()
    pairs.unpersist()
    labels.groupBy(col("lbl"))
      .agg(count(lit(1)).as("csize"), sum(col("v")).as("member_sum"))
      .select(col("lbl").as("cluster_id"), col("csize"), col("member_sum"))
      .orderBy("cluster_id")
  }

  /** per-band LSH bucket histogram (bucket-size distribution — skew
    * visibility across all LshBands tables)
    */
  def lshBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val base = loadSpread(spark, sfDir, "embeddings", "vec_id").select(col("vec_id"), col("embedding"))
    val n = corpusCount(spark, sfDir)
    bandSignatures(base, lshBitsFor(n))
      .groupBy(col("band"), col("sig")).count()
      .groupBy(col("band"), col("count").as("bucket_size"))
      .agg(count(lit(1)).as("n_buckets"))
      .orderBy("band", "bucket_size")
  }
}
