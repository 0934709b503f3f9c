package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers ALL the engine's native
  * functions on every session built with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), so SQL users get them without
  * touching the function registry by hand.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  // arity-checked builders shared with the registerAll surfaces — see
  // graft.functions.FnArity for why an unchecked exprs.head is a hazard
  private def unary(name: String)(mk: Expression => Expression)
      : Seq[Expression] => Expression = graft.functions.FnArity.unary(name)(mk)

  private def binary(name: String)(mk: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = graft.functions.FnArity.binary(name)(mk)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "simhash64"),
      unary("simhash64")(graft.functions.SimHash64)))
    ext.injectFunction((
      FunctionIdentifier("seedhash64"),
      new ExpressionInfo(classOf[graft.functions.SeedHash64].getName, "seedhash64"),
      binary("seedhash64")(graft.functions.SeedHash64)))
    ext.injectFunction((
      FunctionIdentifier("arrayhash64"),
      new ExpressionInfo(classOf[graft.functions.ArrayHash64].getName, "arrayhash64"),
      unary("arrayhash64")(graft.functions.ArrayHash64)))
    ext.injectFunction((
      FunctionIdentifier("md_to_text"),
      new ExpressionInfo(classOf[graft.functions.MdToText].getName, "md_to_text"),
      unary("md_to_text")(graft.functions.MdToText)))
    ext.injectFunction((
      FunctionIdentifier("md_to_html"),
      new ExpressionInfo(classOf[graft.functions.MdToHtml].getName, "md_to_html"),
      unary("md_to_html")(graft.functions.MdToHtml)))
    ext.injectFunction((
      FunctionIdentifier("html_to_md"),
      new ExpressionInfo(classOf[graft.functions.HtmlToMd].getName, "html_to_md"),
      unary("html_to_md")(graft.functions.HtmlToMd)))
  }
}
