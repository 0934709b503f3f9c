package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over whitespace tokens — document fingerprinting for
  * near-duplicate detection at scale.
  *
  * Implemented as a native Catalyst `UnaryExpression` WITH `doGenCode` (not
  * a Scala UDF): the call inlines into whole-stage codegen, so a simhash
  * projection over 10^12 rows stays in the generated loop with no
  * serialization boundary. (Preference order per SURVEY.md §7.4 /
  * spark_guide: compose built-ins > custom Expression > UDF.)
  */
object SimHashImpl {
  /** token-wise 64-bit simhash; deterministic, allocation-free */
  def hash(s: UTF8String): Long = hashString(s.toString)

  def hashString(text: String): Long = {
    // iterates CODEPOINTS, not UTF-16 units: the DuckDB oracle replays the
    // polynomial with `ascii(tok[i:i])` over codepoints, and a
    // supplementary char must contribute ONE term on both sides (identical
    // on BMP-only text, where 1 unit == 1 codepoint)
    val counts = new Array[Int](64)
    val n = text.length
    var h = 1125899906842597L
    var inTok = false
    def closeToken(): Unit = if (inTok) {
      val f = fmix64(h)
      var b = 0
      while (b < 64) {
        if (((f >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      h = 1125899906842597L
      inTok = false
    }
    var i = 0
    while (i < n) {
      val cp = text.codePointAt(i)
      if (cp == ' ') closeToken()
      else { h = 31 * h + cp; inTok = true }
      i += Character.charCount(cp)
    }
    closeToken()
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  // ONE murmur finalizer for the whole oracle-replayed family: the DuckDB
  // SQL replays these exact constants (OracleSql xorShr33/mulMod64), and a
  // second copy could be edited alone, breaking one pairing while the
  // other's crosscheck still passes
  private def fmix64(z: Long): Long = MinHashImpl.fmix64(z)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    SimHashImpl.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = SimHashImpl.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $impl.hash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object functions {
  /** Column API for the native expression */
  def simhash64(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      SimHash64(org.apache.spark.sql.GraftBridge.expression(c)))

  /** register `simhash64` for SQL use on the given session */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", FnArity.unary("simhash64")(SimHash64), "built-in")
}
