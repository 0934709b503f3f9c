package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers the engine's native functions on
  * every session built with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), so SQL users get them without
  * touching the function registry by hand.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => graft.functions.SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("md_to_text"),
      new ExpressionInfo(classOf[graft.functions.MdToText].getName, "md_to_text"),
      (exprs: Seq[Expression]) => graft.functions.MdToText(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("md_to_html"),
      new ExpressionInfo(classOf[graft.functions.MdToHtml].getName, "md_to_html"),
      (exprs: Seq[Expression]) => graft.functions.MdToHtml(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("html_to_md"),
      new ExpressionInfo(classOf[graft.functions.HtmlToMd].getName, "html_to_md"),
      (exprs: Seq[Expression]) => graft.functions.HtmlToMd(exprs.head)))
  }
}
