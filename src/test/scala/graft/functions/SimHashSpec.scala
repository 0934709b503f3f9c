package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimHashSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("graft-simhash-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("expression matches the reference implementation and handles nulls") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val texts = Seq("the quick brown fox", "the quick brown fix",
      "completely different words here", "", "single")
    val df = (texts.map(Option(_)) :+ None).toDF("t")
    val got = df.select(graft.functions.functions.simhash64(col("t")).as("h")).collect()
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i).getLong(0) == SimHashImpl.hashString(t), s"mismatch for '$t'")
    }
    assert(got.last.isNullAt(0)) // null in → null out
  }

  test("near-duplicate texts have small hamming distance") {
    val a = SimHashImpl.hashString("spark encode partition buffer stream record value " * 5)
    val b = SimHashImpl.hashString(("spark encode partition buffer stream record value " * 5) + "extra")
    val c = SimHashImpl.hashString("totally unrelated sentence about weather and cooking food")
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, b) < ham(a, c))
    assert(ham(a, b) <= 8)
  }

  test("hash kernels iterate codepoints, matching DuckDB's ascii(s[i:i])") {
    // a supplementary char must contribute ONE polynomial term — the
    // DuckDB oracles slice by codepoint, and UTF-16 iteration would feed
    // two surrogate units instead
    val rocket = new String(Character.toChars(0x1F680))
    val seed = 1125899906842597L
    assert(graft.functions.MinHashImpl.poly(rocket) == 31 * seed + 0x1F680)
    assert(graft.functions.MinHashImpl.poly(s"a${rocket}b") ==
      31 * (31 * (31 * seed + 'a') + 0x1F680) + 'b')
    // simhash: a one-token doc's hash is fmix64(poly(token)) with all its
    // set bits voted positive -> equals hashing the BMP doc whose single
    // codepoint replays the same polynomial? (cheap invariant instead:
    // token boundaries and values are codepoint-stable)
    assert(SimHashImpl.hashString(rocket) != 0L)
    assert(SimHashImpl.hashString(s"$rocket $rocket") ==
      SimHashImpl.hashString(rocket)) // identical tokens vote identically
    // rolling fingerprint: below-window path is the plain polynomial
    assert(graft.queries.TextQueries.rollingMinHash(rocket, 16) == 0x1F680L)
    assert(graft.queries.TextQueries.rollingMinHash(s"a$rocket", 16) ==
      1000003L * 'a' + 0x1F680)
  }

  test("participates in whole-stage codegen and SQL registry") {
    import spark.implicits._
    // a range scan (not LocalTableScan) so a codegen stage actually forms
    val wide = spark.range(100)
      .select(concat_ws(" ", lit("tok"), col("id"), lit("suffix")).as("t"))
    val plan = wide.select(graft.functions.functions.simhash64(col("t")))
      .queryExecution.executedPlan.toString
    // "*(1)" prefixes operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [simhash64("), plan)

    val df = Seq("a b c", "d e f").toDF("t")
    graft.functions.functions.registerAll(spark)
    df.createOrReplaceTempView("simhash_in")
    val viaSql = spark.sql("SELECT simhash64(t) AS h FROM simhash_in").collect()
    assert(viaSql.map(_.getLong(0)).toSeq ==
      Seq(SimHashImpl.hashString("a b c"), SimHashImpl.hashString("d e f")))

    // arity is checked on THIS registration path too: an extra argument
    // must fail analysis, not silently hash only the first one
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash64(t, t) FROM simhash_in").collect()
    }
    assert(e.getMessage.contains("simhash64"))
  }

  test("arrayhash64 nulls out arrays containing a null element") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Long](1L, 2L)),
      (2L, Seq[java.lang.Long](1L, null)),
      (3L, Seq[java.lang.Long](1L, 0L))).toDF("id", "a")
    val out = df.select(col("id"),
        graft.functions.minhashFunctions.arrayhash64(col("a")).as("h"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out(1L).isDefined)
    assert(out(2L).isEmpty, "a null element must yield NULL, not hash-as-0")
    assert(out(3L).isDefined && out(2L) != out(3L),
      "null-vs-0 positions must not collide")
  }

  test("seedhash64 widens a SQL integer-literal seed to long") {
    import spark.implicits._
    Seq("abc").toDF("t").createOrReplaceTempView("seedhash_in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "seedhash64",
      graft.functions.FnArity.binary("seedhash64")(graft.functions.SeedHash64),
      "built-in")
    val viaSql = spark.sql("SELECT seedhash64(t, 7) AS h FROM seedhash_in")
      .collect().head.getLong(0)
    assert(viaSql == graft.functions.MinHashImpl.hashSeed(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"), 7L))
  }
}
