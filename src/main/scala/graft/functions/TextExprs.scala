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

object textFunctions {
  private def wrap(e: Expression): Column =
    org.apache.spark.sql.GraftBridge.column(e)
  private def expr(c: Column): Expression =
    org.apache.spark.sql.GraftBridge.expression(c)

  def mdToText(c: Column): Column = wrap(MdToText(expr(c)))
  def mdToHtml(c: Column): Column = wrap(MdToHtml(expr(c)))
  def htmlToMd(c: Column): Column = wrap(HtmlToMd(expr(c)))

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
