package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** bounded_collect_long must be EXACTLY the two-phase
  * count-filter-then-collect pattern it replaced in the dedup/LSH queries:
  * full value list for groups at or under the cap, NULL above it —
  * including across partial-aggregate merges (the buffer stops growing at
  * cap+1, so a merge of two capped partials must still detect over-cap).
  */
class BoundedCollectSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bounded-collect-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import boundedCollectFunctions.boundedCollectLong

  test("groups under, at and over the cap (merge paths forced by partitions)") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // group g has g+1 members 0..g; spread over many partitions so partial
    // buffers merge
    val cap = 5
    val rows = for (g <- 0 until 12; v <- 0 to g) yield (g.toLong, v.toLong)
    val df = rows.toDF("g", "v").repartition(8, col("v"))
    val got = df.groupBy("g")
      .agg(boundedCollectLong(col("v"), cap).as("ids"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Long](1)).map(_.sorted))
      .toMap
    for (g <- 0 until 12) {
      if (g + 1 <= cap)
        assert(got(g.toLong).contains((0L to g).toVector),
          s"group $g (size ${g + 1}) must keep its full list")
      else
        assert(got(g.toLong).isEmpty,
          s"group $g (size ${g + 1}) exceeds cap=$cap and must be NULL")
    }
  }

  test("pair variant: cap semantics and (k, v) alignment across merges") {
    import boundedCollectFunctions.boundedCollectLongPair
    import spark.implicits._
    val cap = 4
    // v is a pure function of k, so alignment errors are detectable
    val rows = for (g <- 0 until 10; k <- 0 to g) yield (g.toLong, k.toLong, k.toLong * 7 + 1)
    val df = rows.toDF("g", "k", "v").repartition(8, col("k"))
    val got = df.groupBy("g")
      .agg(boundedCollectLongPair(col("k"), col("v"), cap).as("ids"))
      .where(col("ids").isNotNull)
      .select(col("g"), explode(col("ids")).as("p"))
      .select(col("g"), col("p.k"), col("p.v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (_, k, v) => assert(v == k * 7 + 1, s"misaligned pair ($k, $v)") }
    val byGroup = got.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    for (g <- 0 until 10) {
      if (g + 1 <= cap) assert(byGroup(g.toLong) == (0L to g).toVector)
      else assert(!byGroup.contains(g.toLong), s"group $g must be NULL over cap")
    }
  }

  test("bounded top-k matches the row_number window it replaced") {
    import boundedCollectFunctions.boundedTopKByCount
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val k = 5
    // duplicate counts force the tie-break path (c desc, key asc)
    val rows = Seq.fill(3000)((rnd.nextInt(6).toLong,
      rnd.nextInt(40).toLong + 1, "t" + rnd.nextInt(400)))
      .distinct.map { case (g, c, t) => (g, c, t) }
    val df = rows.toDF("g", "c", "t")
      .groupBy("g", "t").agg(max(col("c")).as("c")) // unique (g, t)
      .repartition(8, col("t")).cache()
    val viaAgg = df.groupBy("g")
      .agg(boundedTopKByCount(col("c"), col("t"), k).as("top"))
      .select(col("g"), explode(col("top")).as("e"))
      .select(col("g"), col("e.c"), col("e.tri"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val viaWindow = df.withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("c").desc, col("t"))))
      .where(col("rnk") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(1))).toSet
    assert(viaAgg == viaWindow)
    df.unpersist()
    ()
  }

  test("matches the two-phase count+filter+collect on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val cap = 7
    val rows = Seq.fill(5000)((rnd.nextInt(300).toLong, rnd.nextLong()))
    val df = rows.toDF("g", "v").repartition(16, col("v")).cache()
    val fused = df.groupBy("g")
      .agg(boundedCollectLong(col("v"), cap).as("ids"))
      .where(col("ids").isNotNull)
      .select(col("g"), explode(col("ids")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val counts = df.groupBy("g").agg(count(lit(1)).as("n"))
      .where(col("n") <= cap).select("g")
    val twoPhase = df.join(counts, Seq("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fused == twoPhase)
    df.unpersist()
    ()
  }
}
