package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q_serde_errors: the fault pattern must route every row to the right
  * taxonomy kind, the healthy rows must decode to their exact values, and
  * the exception-message char sums must follow the trim250 echo arithmetic
  * the DuckDB oracle re-derives (OracleSql.serdeErrors) — BOTH branches:
  * an echo at or under 250 chars passes through, a longer one is cut to
  * 250 + one '…' char.
  */
class SerdeErrorQuerySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-serde-error-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("serdeErrors classifies, decodes, and pins trim250 message lengths") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-serde-q").toString
    // keys 0..69: residue 3 -> illegal_cell (10 rows), residue 5 ->
    // illegal_row (10 rows), rest ok (50 rows). Key 5's 3-char name makes
    // its 20x echo 60 chars — the untruncated branch; every other bad-row
    // echo is 360 chars — the truncated branch.
    val rows = (0 until 70).map { k =>
      (k.toLong, if (k == 5) "abc" else f"Customer#$k%09d")
    }
    rows.toDF("c_custkey", "c_name").write.parquet(s"$dir/customer.parquet")

    val out = FormatQueries.serdeErrors(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet == Set("ok", "illegal_cell", "illegal_row"))

    val badKeys = (0 until 70).filter(k => k % 7 == 3 || k % 7 == 5)
    val okKeys = (0 until 70).filterNot(badKeys.contains)
    assert(out("ok") == ((okKeys.size.toLong, 0L,
      okKeys.map(_.toLong).sum, okKeys.size.toLong * 18)))

    // cell message is a constant: the real exception renders it
    val cellMsg = new graft.sources.SerdeErrors.IllegalCellException(
      "f9", "unknown field number 9 in message graftq.Cust").getMessage
    assert(out("illegal_cell") == ((10L, 10L * cellMsg.length, 0L, 0L)))

    // row message length re-derived by the oracle arithmetic, NOT by the
    // exception class: prefix + min(echo, 250 + '…') + ']'
    val prefix = "illegal row with data [".length
    val truncated = prefix + 251 + 1 // 18-char name * 20 = 360 -> cut
    val short = prefix + 60 + 1 // "abc" * 20 = 60 -> passes through
    assert(out("illegal_row") == ((10L, 9L * truncated + short, 0L, 0L)))
  }
}
