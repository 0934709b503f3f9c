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

  // ---- reference-link definitions: `[label]: url "title"` ----
  private val RefDef =
    "(?m)^\\s{0,3}\\[([^\\]]+)\\]:\\s*(\\S+)(?:\\s+\"[^\"]*\")?\\s*$".r

  /** collect `[label]: url` definitions (labels case-insensitive per
    * commonmark) and strip the definition lines from the document
    */
  private def extractRefDefs(md: String): (String, Map[String, String]) = {
    val defs = RefDef.findAllMatchIn(md)
      .map(m => m.group(1).toLowerCase -> m.group(2)).toMap
    (RefDef.replaceAllIn(md, ""), defs)
  }

  /** resolve `[text][label]` and collapsed `[text][]` reference links into
    * inline `[text](url)` form so the single inline pipeline handles both
    */
  private def resolveRefLinks(md: String, defs: Map[String, String]): String = {
    if (defs.isEmpty) return md
    val ref = "(!?)\\[([^\\]]*)\\]\\[([^\\]]*)\\]".r
    ref.replaceAllIn(md, m => {
      val bang = m.group(1); val text = m.group(2)
      val label = if (m.group(3).isEmpty) text else m.group(3)
      defs.get(label.toLowerCase) match {
        case Some(url) => java.util.regex.Matcher.quoteReplacement(
          s"$bang[$text]($url)")
        case None => java.util.regex.Matcher.quoteReplacement(m.matched)
      }
    })
  }

  // ---- markdown → plain text (strip syntax, keep content) ----
  def toText(md: String): String = {
    val (body, defs) = extractRefDefs(md)
    var s = resolveRefLinks(body, defs)
    s = s.replaceAll("(?s)```.*?```", "") // fenced code blocks dropped
    // headings: trim closing #s (horizontal whitespace only — \s would
    // swallow the blank line after a heading), then strip the leading #s
    s = s.replaceAll("(?m)^(#{1,6})[ \\t]+(.*?)[ \\t]*#*[ \\t]*$", "$1 $2")
      .replaceAll("(?m)^#{1,6}\\s*", "")
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

  // ---- markdown → html ----
  /** headings, fenced code, nested ordered/unordered lists (2-space
    * indent levels), blockquotes, thematic breaks, raw-HTML block
    * passthrough, and the inline set (links incl. reference style,
    * images, emphasis, code)
    */
  def toHtml(md: String): String = {
    val (body, defs) = extractRefDefs(md)
    val out = new StringBuilder
    val lines = resolveRefLinks(body, defs).split("\n", -1)
    var i = 0
    // stack of open list tags ("ul"/"ol"), one per nesting level
    var lists = List.empty[String]
    def closeTo(depth: Int): Unit =
      while (lists.length > depth) {
        out ++= s"</li>\n</${lists.head}>\n"; lists = lists.tail
      }
    var quoting = false
    def closeQuote(): Unit =
      if (quoting) { out ++= "</blockquote>\n"; quoting = false }
    def closeBlocks(): Unit = { closeTo(0); closeQuote() }

    val h = "^(#{1,6})\\s+(.*?)\\s*#*\\s*$".r
    val bullet = "^(\\s*)([-*+]|\\d+[.)])\\s+(.*)$".r
    while (i < lines.length) {
      val line = lines(i)
      if (line.startsWith("```")) {
        closeBlocks()
        val code = new StringBuilder
        i += 1
        while (i < lines.length && !lines(i).startsWith("```")) {
          code ++= escapeHtml(lines(i)) += '\n'
          i += 1
        }
        out ++= s"<pre><code>${code.toString}</code></pre>\n"
      } else line match {
        case h(hashes, text) =>
          closeBlocks()
          val n = hashes.length
          out ++= s"<h$n>${inline(text)}</h$n>\n"
        // thematic break wins over list interpretation ("- - -" is a rule
        // per commonmark, not a bullet whose text is "- -")
        case l if l.matches("^\\s*([-*_]\\s*){3,}$") =>
          closeBlocks()
          out ++= "<hr/>\n"
        case bullet(indent, marker, text) =>
          closeQuote()
          val depth = indent.replace("\t", "  ").length / 2 + 1
          val tag = if (marker.matches("\\d+[.)]")) "ol" else "ul"
          if (lists.length >= depth) {
            closeTo(depth)
            // same level: close the open item; switch list type if needed
            if (lists.head != tag) {
              out ++= s"</li>\n</${lists.head}>\n<$tag>\n"
              lists = tag :: lists.tail
            } else out ++= "</li>\n"
          } else {
            // deeper: open nested lists inside the current item
            while (lists.length < depth) { out ++= s"<$tag>\n"; lists = tag :: lists }
          }
          out ++= s"<li>${inline(text)}"
        case l if l.startsWith(">") =>
          closeTo(0)
          if (!quoting) { out ++= "<blockquote>\n"; quoting = true }
          val inner = l.replaceFirst("^>\\s?", "")
          if (inner.nonEmpty) out ++= s"<p>${inline(inner)}</p>\n"
        case "" => closeBlocks()
        case l if l.trim.startsWith("<") =>
          closeBlocks()
          out ++= l + "\n" // raw HTML block passthrough (commonmark-style)
        case other =>
          closeBlocks()
          out ++= s"<p>${inline(other)}</p>\n"
      }
      i += 1
    }
    closeBlocks()
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
    // tables → GFM pipe tables (≙ flexmark html2md's table handling —
    // reference HtmlToMarkdownTest.should_convert_html_table_to_markdown):
    // first row (thead or not) becomes the header, then |---| separator
    val tableRe = "(?is)<table[^>]*>(.*?)</table>".r
    s = tableRe.replaceAllIn(s, m => {
      val body = m.group(1)
      val rows = "(?is)<tr[^>]*>(.*?)</tr>".r.findAllMatchIn(body).map { r =>
        "(?is)<t[hd][^>]*>(.*?)</t[hd]>".r.findAllMatchIn(r.group(1))
          .map(_.group(1).trim.replaceAll("\\s+", " ").replace("|", "\\|"))
          .toList
      }.filter(_.nonEmpty).toList
      val md = rows match {
        case Nil => ""
        case header :: rest =>
          val line = (cs: List[String]) => cs.mkString("| ", " | ", " |")
          (line(header) :: header.map(_ => "---").mkString("|", "|", "|") ::
            rest.map(line)).mkString("\n") + "\n\n"
      }
      java.util.regex.Matcher.quoteReplacement(md)
    })
    // definition lists → the `Term` / `: definition` pandoc/flexmark form
    val dlRe = "(?is)<dl[^>]*>(.*?)</dl>".r
    s = dlRe.replaceAllIn(s, m => {
      val items = "(?is)<(dt|dd)[^>]*>(.*?)</\\1>".r.findAllMatchIn(m.group(1))
        .map(x => (x.group(1).toLowerCase, x.group(2).trim)).map {
          case ("dt", t) => s"$t\n"
          case (_, d) => s": $d\n"
        }.mkString
      java.util.regex.Matcher.quoteReplacement(items + "\n")
    })
    // ordered lists first: number the items 1..n within each <ol> scope
    val olRe = "(?is)<ol[^>]*>(.*?)</ol>".r
    s = olRe.replaceAllIn(s, m => {
      val items = "(?is)<li[^>]*>(.*?)</li>".r
        .findAllMatchIn(m.group(1)).map(_.group(1).trim).toList
      java.util.regex.Matcher.quoteReplacement(
        items.zipWithIndex.map { case (t, i) => s"${i + 1}. $t\n" }.mkString)
    })
    s = s.replaceAll("(?is)<li[^>]*>(.*?)</li>", "- $1\n")
    s = s.replaceAll("(?is)</?(ul|ol)[^>]*>", "")
    // blockquotes: every inner line gets the marker
    val bqRe = "(?is)<blockquote[^>]*>(.*?)</blockquote>".r
    s = bqRe.replaceAllIn(s, m => {
      val inner = m.group(1)
        .replaceAll("(?is)<p[^>]*>(.*?)</p>", "$1\n")
        .trim.split("\n").map(l => s"> ${l.trim}").mkString("\n")
      java.util.regex.Matcher.quoteReplacement(inner + "\n\n")
    })
    s = s.replaceAll("(?is)<hr\\s*/?>", "\n---\n")
    s = s.replaceAll("(?is)<p[^>]*>(.*?)</p>", "$1\n\n")
    s = s.replaceAll("(?is)<br\\s*/?>", "\n")
    s = s.replaceAll("(?s)<[^>]+>", "") // remaining tags (ignoreTags analog)
    s = decodeEntities(s)
    s.replaceAll("\\n{3,}", "\n\n").trim
  }

  /** HTML entity decode, named core set + numeric (&#NN; / &#xHH;).
    * `&amp;` decodes LAST: `&amp;lt;` is the literal text "&lt;", not "<"
    * — the old amp-first ordering double-decoded it.
    */
  private def decodeEntities(s0: String): String = {
    var s = s0
    s = s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'").replace("&#39;", "'")
      .replace("&nbsp;", " ")
    s = "&#(x?)([0-9a-fA-F]+);".r.replaceAllIn(s, m => {
      val cp = try {
        if (m.group(1).isEmpty) Integer.parseInt(m.group(2), 10)
        else Integer.parseInt(m.group(2), 16)
      } catch { case _: NumberFormatException => -1 }
      // surrogate code points are "valid" to isValidCodePoint but toChars
      // would emit an UNPAIRED surrogate — not UTF-8-encodable, so the
      // transform output would stop being a pure function of the input
      // bytes. The HTML spec decodes them to U+FFFD; do the same.
      if (cp >= 0xD800 && cp <= 0xDFFF)
        java.util.regex.Matcher.quoteReplacement("�")
      else if (cp >= 0 && Character.isValidCodePoint(cp))
        java.util.regex.Matcher.quoteReplacement(new String(Character.toChars(cp)))
      else java.util.regex.Matcher.quoteReplacement(m.matched)
    })
    s.replace("&amp;", "&")
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
