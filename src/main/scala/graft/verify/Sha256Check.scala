package graft.verify

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The correctness invariant (BASELINE.json `input_hint`): decoded output
  * must reproduce every value bit-identical. Compared as a multiset of
  * per-row sha256 tuples — a full-outer join on the hashed projection where
  * any count difference is a mismatch.
  */
object Sha256Check {

  /** number of differing hash-groups between the two frames (0 = identical
    * multisets of rows across `cols`)
    */
  def mismatchGroups(original: DataFrame, decoded: DataFrame, cols: Seq[String]): Long = {
    // "N"/"V" prefix disambiguates NULL from every real string value.
    // The aggregate is aliased DIRECTLY (not .count + rename): a compared
    // column named "count" would otherwise collide with the aggregate and
    // the rename would hit both, breaking the join key resolution. The
    // count names themselves are made collision-proof against ANY compared
    // column name, not just "count" — a table with a column literally
    // named "cnt_a" must not trip AMBIGUOUS_REFERENCE.
    var suffix = ""
    while (cols.contains(s"cnt_a$suffix") || cols.contains(s"cnt_b$suffix"))
      suffix += "_"
    val (cntA, cntB) = (s"cnt_a$suffix", s"cnt_b$suffix")
    def hashed(df: DataFrame, cntName: String) = df
      .select(cols.map(c => sha2(concat(
        when(col(c).isNull, lit("N")).otherwise(lit("V")),
        coalesce(col(c), lit(""))), 256).as(c)): _*)
      .groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as(cntName))
    val a = hashed(original, cntA)
    val b = hashed(decoded, cntB)
    a.join(b, cols, "full_outer")
      .where(col(cntA).isNull || col(cntB).isNull || col(cntA) =!= col(cntB))
      .count()
  }
}
