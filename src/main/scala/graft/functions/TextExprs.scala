package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-doc text transforms as native Catalyst expressions WITH doGenCode —
  * the same pattern as SimHash64: the call inlines into whole-stage codegen
  * with no UDF serialization boundary (≙ reference markdown/MarkdownToText
  * .java:114-165, whose AST-visitor flattening is a per-doc pure function).
  */
object TextExprImpl {
  def mdToText(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.sources.Markdown.toText(s.toString))

  def mdToHtml(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.sources.Markdown.toHtml(s.toString))

  def htmlToMd(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.sources.Markdown.htmlToMarkdown(s.toString))
}

abstract class TextTransformExpr extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string column, got ${child.dataType.catalogString}")

  protected def implMethod: String

  // direct cast like the sibling expressions: checkInputDataTypes already
  // guarantees StringType, and a defensive `case _ => null` would silently
  // diverge from the codegen path (which casts unconditionally) if an
  // internal invariant ever broke
  override def nullSafeEval(v: Any): Any = evalImpl(v.asInstanceOf[UTF8String])

  protected def evalImpl(s: UTF8String): UTF8String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = TextExprImpl.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $impl.$implMethod($c);")
  }
}

case class MdToText(child: Expression) extends TextTransformExpr {
  protected def implMethod: String = "mdToText"
  protected def evalImpl(s: UTF8String): UTF8String = TextExprImpl.mdToText(s)
  override def prettyName: String = "md_to_text"
  override protected def withNewChildInternal(newChild: Expression): MdToText =
    copy(child = newChild)
}

case class MdToHtml(child: Expression) extends TextTransformExpr {
  protected def implMethod: String = "mdToHtml"
  protected def evalImpl(s: UTF8String): UTF8String = TextExprImpl.mdToHtml(s)
  override def prettyName: String = "md_to_html"
  override protected def withNewChildInternal(newChild: Expression): MdToHtml =
    copy(child = newChild)
}

case class HtmlToMd(child: Expression) extends TextTransformExpr {
  protected def implMethod: String = "htmlToMd"
  protected def evalImpl(s: UTF8String): UTF8String = TextExprImpl.htmlToMd(s)
  override def prettyName: String = "html_to_md"
  override protected def withNewChildInternal(newChild: Expression): HtmlToMd =
    copy(child = newChild)
}

/** Rabin–Karp rolling-hash min-fingerprint (window over CODEPOINTS, base
  * 1000003, mod 2^64, unsigned min across window positions) — the document
  * fingerprinting kernel, ORACLE-COUPLED to OracleSql.fingerprint's
  * HUGEINT replay: any change here breaks the paired SQL.
  */
object RollingHashImpl {
  def minHash(s: UTF8String, window: Int): Long = minHashString(s.toString, window)

  def minHashString(text: String, window: Int): Long = {
    // CODEPOINT windows: the DuckDB oracle computes the hash from
    // `ascii(text[i:i])` with `len(text)` positions — both codepoint-based
    // — so a supplementary char must be ONE window element on both sides
    // (identical on BMP-only text)
    val cps = text.codePoints().toArray
    val n = cps.length
    if (n == 0) return 0L
    val B = 1000003L
    if (n < window) {
      var h = 0L
      var i = 0
      while (i < n) { h = h * B + cps(i); i += 1 }
      return h
    }
    // B^(window-1) for the roll-off term
    var bpow = 1L
    var k = 0
    while (k < window - 1) { bpow *= B; k += 1 }
    var h = 0L
    var i = 0
    while (i < window) { h = h * B + cps(i); i += 1 }
    var minH = h
    while (i < n) {
      h = (h - cps(i - window) * bpow) * B + cps(i)
      if (java.lang.Long.compareUnsigned(h, minH) < 0) minH = h
      i += 1
    }
    minH
  }
}

/** the rolling min-fingerprint as a codegen'd expression (window is a plan
  * constant, not a child): a fingerprint projection over 10^12 rows stays
  * inside WholeStageCodegen — the prior typed Dataset.map paid an encoder
  * ser/de round-trip per row
  */
case class RollingMinHash64(child: Expression, window: Int)
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_minhash64 needs a string column, got ${child.dataType.catalogString}")
    else if (window < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_minhash64 needs window >= 1, got $window")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any =
    RollingHashImpl.minHash(v.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = RollingHashImpl.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $impl.minHash($c, $window);")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash64 =
    copy(child = newChild)

  override def prettyName: String = "rolling_minhash64"
}

/** per-doc CODEPOINT-trigram histogram (the lang-id feature extractor) —
  * one HashMap per document, emitted as array<struct<tri,cnt>>: the shuffle
  * carries one row per DISTINCT trigram per doc, not one per position, and
  * the whole projection stays inside WholeStageCodegen (the prior typed
  * Dataset.flatMap paid an encoder ser/de round-trip per output row).
  * Trigram extraction is identical to the previous flatMap (codepoint
  * windows — the DuckDB oracle slices text[i:i+2] by codepoint).
  */
object TrigramImpl {
  def counts(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val cps = s.toString.codePoints().toArray
    if (cps.length < 3)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val m = new java.util.HashMap[String, Long]()
    var i = 0
    val last = cps.length - 3
    while (i <= last) {
      m.merge(new String(cps, i, 3), 1L, (a, b) => a + b)
      i += 1
    }
    val out = new Array[Any](m.size())
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(e.getKey), e.getValue)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class TrigramCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("tri", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType, nullable = false))),
      containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"trigram_counts needs a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    TrigramImpl.counts(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = TrigramImpl.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $impl.counts($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TrigramCounts =
    copy(child = newChild)

  override def prettyName: String = "trigram_counts"
}

object textFunctions {
  private def wrap(e: Expression): Column =
    org.apache.spark.sql.GraftBridge.column(e)
  private def expr(c: Column): Expression =
    org.apache.spark.sql.GraftBridge.expression(c)

  def mdToText(c: Column): Column = wrap(MdToText(expr(c)))
  def mdToHtml(c: Column): Column = wrap(MdToHtml(expr(c)))
  def htmlToMd(c: Column): Column = wrap(HtmlToMd(expr(c)))
  def rollingMinHash64(c: Column, window: Int): Column =
    wrap(RollingMinHash64(expr(c), window))
  def trigramCounts(c: Column): Column = wrap(TrigramCounts(expr(c)))

  /** register md_to_text / md_to_html / html_to_md for SQL use */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction(
      "md_to_text", FnArity.unary("md_to_text")(MdToText), "built-in")
    r.createOrReplaceTempFunction(
      "md_to_html", FnArity.unary("md_to_html")(MdToHtml), "built-in")
    r.createOrReplaceTempFunction(
      "html_to_md", FnArity.unary("html_to_md")(HtmlToMd), "built-in")
  }
}
