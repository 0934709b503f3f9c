package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Markdown/HTML text transforms (reference: markdown/MarkdownToHtml.java,
  * markdown/MarkdownToText.java:114-165, markdown/HtmlToMarkdown.java —
  * commonmark/flexmark/jsoup are not on this classpath, so these are
  * self-contained implementations of the common-markdown core: headings,
  * emphasis, inline/fenced code, links, images, lists, blockquotes, rules).
  * Applied as whole-doc string transforms (narrow map / codegen'd
  * regexp_replace chain — the reference's "udf text transform" analog).
  */
object Markdown {

  // ---- markdown → plain text (strip syntax, keep content) ----
  def toText(md: String): String = {
    var s = md
    s = s.replaceAll("(?s)```.*?```", "") // fenced code blocks dropped
    s = s.replaceAll("(?m)^#{1,6}\\s*", "") // headings
    s = s.replaceAll("!\\[([^\\]]*)\\]\\([^)]*\\)", "$1") // images → alt
    s = s.replaceAll("\\[([^\\]]*)\\]\\([^)]*\\)", "$1") // links → text
    s = s.replaceAll("(\\*\\*|__)(.*?)\\1", "$2") // bold
    s = s.replaceAll("(\\*|_)(.*?)\\1", "$2") // italic
    s = s.replaceAll("`([^`]*)`", "$1") // inline code
    s = s.replaceAll("(?m)^\\s*([-*+]|\\d+\\.)\\s+", "") // list markers
    s = s.replaceAll("(?m)^>\\s?", "") // blockquotes
    s = s.replaceAll("(?m)^([-*_]\\s?){3,}$", "") // rules
    s.replaceAll("\\n{3,}", "\n\n").trim
  }

  // ---- markdown → html (core constructs) ----
  def toHtml(md: String): String = {
    val out = new StringBuilder
    val lines = md.split("\n", -1)
    var i = 0
    var inList = false
    def closeList(): Unit = if (inList) { out ++= "</ul>\n"; inList = false }
    while (i < lines.length) {
      val line = lines(i)
      if (line.startsWith("```")) {
        closeList()
        val code = new StringBuilder
        i += 1
        while (i < lines.length && !lines(i).startsWith("```")) {
          code ++= escapeHtml(lines(i)) += '\n'
          i += 1
        }
        out ++= s"<pre><code>${code.toString}</code></pre>\n"
      } else {
        val h = "^(#{1,6})\\s+(.*)$".r
        line match {
          case h(hashes, text) =>
            closeList()
            val n = hashes.length
            out ++= s"<h$n>${inline(text)}</h$n>\n"
          case l if l.matches("^\\s*[-*+]\\s+.*") =>
            if (!inList) { out ++= "<ul>\n"; inList = true }
            out ++= s"<li>${inline(l.replaceFirst("^\\s*[-*+]\\s+", ""))}</li>\n"
          case "" => closeList()
          case other =>
            closeList()
            out ++= s"<p>${inline(other)}</p>\n"
        }
      }
      i += 1
    }
    closeList()
    out.toString.trim
  }

  private def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def inline(s0: String): String = {
    var s = escapeHtml(s0)
    s = s.replaceAll("!\\[([^\\]]*)\\]\\(([^)]*)\\)", "<img alt=\"$1\" src=\"$2\"/>")
    s = s.replaceAll("\\[([^\\]]*)\\]\\(([^)]*)\\)", "<a href=\"$2\">$1</a>")
    s = s.replaceAll("(\\*\\*|__)(.*?)\\1", "<strong>$2</strong>")
    s = s.replaceAll("(\\*|_)(.*?)\\1", "<em>$2</em>")
    s = s.replaceAll("`([^`]*)`", "<code>$1</code>")
    s
  }

  // ---- html → markdown (inverse of the core constructs) ----

  /** `ignoreTags`: whole elements (incl. content) dropped before conversion;
    * `baseUri`: relative href/src attributes resolved absolute
    * (≙ reference HtmlToMarkdown.java:108-176 jsoup pre-processing)
    */
  def htmlToMarkdown(html: String, ignoreTags: Seq[String], baseUri: String): String = {
    var s = html
    for (tag <- ignoreTags) {
      val t = java.util.regex.Pattern.quote(tag.toLowerCase)
      s = s.replaceAll(s"(?is)<$t\\b[^>]*/>", "")
      s = s.replaceAll(s"(?is)<$t\\b[^>]*>.*?</$t>", "")
    }
    if (baseUri != null && baseUri.nonEmpty) {
      val base = java.net.URI.create(baseUri)
      val attr = "(?is)\\b(href|src)=\"([^\"]*)\"".r
      s = attr.replaceAllIn(s, m => {
        val (k, v) = (m.group(1), m.group(2))
        val resolved =
          try {
            val u = java.net.URI.create(v)
            if (u.isAbsolute || v.isEmpty) v else base.resolve(u).toString
          } catch { case _: Throwable => v }
        java.util.regex.Matcher.quoteReplacement(s"""$k="$resolved"""")
      })
    }
    htmlToMarkdown(s)
  }

  def htmlToMarkdown(html: String): String = {
    var s = html
    s = s.replaceAll("(?s)<script.*?</script>|(?s)<style.*?</style>", "")
    for (n <- 1 to 6)
      s = s.replaceAll(s"(?is)<h$n[^>]*>(.*?)</h$n>", ("#" * n) + " $1\n\n")
    s = s.replaceAll("(?is)<strong[^>]*>(.*?)</strong>|(?is)<b[^>]*>(.*?)</b>", "**$1$2**")
    s = s.replaceAll("(?is)<em[^>]*>(.*?)</em>|(?is)<i[^>]*>(.*?)</i>", "*$1$2*")
    s = s.replaceAll("(?is)<pre><code[^>]*>(.*?)</code></pre>", "```\n$1```\n")
    s = s.replaceAll("(?is)<code[^>]*>(.*?)</code>", "`$1`")
    s = s.replaceAll("(?is)<a\\s+[^>]*href=\"([^\"]*)\"[^>]*>(.*?)</a>", "[$2]($1)")
    s = s.replaceAll("(?is)<img\\s+[^>]*alt=\"([^\"]*)\"[^>]*src=\"([^\"]*)\"[^>]*/?>", "![$1]($2)")
    s = s.replaceAll("(?is)<li[^>]*>(.*?)</li>", "- $1\n")
    s = s.replaceAll("(?is)</?(ul|ol)[^>]*>", "")
    s = s.replaceAll("(?is)<p[^>]*>(.*?)</p>", "$1\n\n")
    s = s.replaceAll("(?is)<br\\s*/?>", "\n")
    s = s.replaceAll("(?s)<[^>]+>", "") // remaining tags (ignoreTags analog)
    s = s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
    s.replaceAll("\\n{3,}", "\n\n").trim
  }

  // ---- Spark wrappers: whole-doc narrow maps ----
  /** native codegen'd expression (graft.functions.MdToText) — stays inside
    * whole-stage codegen, unlike a Scala UDF (SimHash64 precedent)
    */
  def mdToTextCol(df: DataFrame, in: String, out: String): DataFrame =
    df.withColumn(out, graft.functions.textFunctions.mdToText(col(in)))

  def transformFiles(spark: SparkSession, path: String, f: String => String): Dataset[String] = {
    import spark.implicits._
    spark.read.option("wholetext", true).text(path).as[String].map(f)
  }
}
