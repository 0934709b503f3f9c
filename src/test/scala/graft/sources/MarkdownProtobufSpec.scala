package graft.sources

import graft.codec.ByteWriter
import org.scalatest.funsuite.AnyFunSuite

class MarkdownProtobufSpec extends AnyFunSuite {

  // ---- markdown ----
  test("markdown to text strips syntax, keeps content") {
    val md =
      """# Title
        |Some **bold** and *italic* and `code`.
        |
        |- item one
        |- [a link](http://example.com)
        |
        |> quoted line
        |
        |```scala
        |val hidden = 1
        |```
        |Tail text.""".stripMargin
    val text = Markdown.toText(md)
    assert(text.contains("Title"))
    assert(text.contains("bold") && !text.contains("**"))
    assert(text.contains("a link") && !text.contains("http://example.com"))
    assert(text.contains("quoted line") && !text.contains(">"))
    assert(!text.contains("hidden")) // fenced code dropped like the AST visitor
    assert(text.contains("Tail text."))
  }

  test("markdown to html renders core constructs") {
    val html = Markdown.toHtml(
      "# H1\n\npara with **bold** and [link](http://x)\n\n- a\n- b\n\n```\ncode<tag>\n```")
    assert(html.contains("<h1>H1</h1>"))
    assert(html.contains("<p>para with <strong>bold</strong> and <a href=\"http://x\">link</a></p>"))
    assert(html.contains("<ul>\n<li>a</li>\n<li>b</li>\n</ul>"))
    assert(html.contains("<pre><code>code&lt;tag&gt;\n</code></pre>"))
  }

  test("html to markdown inverts the core constructs") {
    val md = Markdown.htmlToMarkdown(
      "<h2>Head</h2><p>Text with <strong>bold</strong> and <a href=\"http://x\">link</a></p>" +
        "<ul><li>one</li><li>two</li></ul><span>stray</span>")
    assert(md.contains("## Head"))
    assert(md.contains("**bold**"))
    assert(md.contains("[link](http://x)"))
    assert(md.contains("- one"))
    assert(md.contains("stray")) // unknown tags stripped, content kept
    assert(!md.contains("<"))
  }

  test("md -> html -> md survives for the shared core") {
    val md = "# Title\n\nplain **bold** *it* `c` [l](http://u)\n\n- x\n- y"
    val back = Markdown.htmlToMarkdown(Markdown.toHtml(md))
    assert(back.contains("# Title") && back.contains("**bold**") &&
      back.contains("[l](http://u)") && back.contains("- x"))
  }

  // ---- protobuf wire format ----
  test("decodes varint, string, nested, repeated fields") {
    val inner = new ByteWriter()
    Protobuf.encodeVarintField(inner, 1, 7L)
    Protobuf.encodeStringField(inner, 2, "world")

    val w = new ByteWriter()
    Protobuf.encodeVarintField(w, 1, 150L)
    Protobuf.encodeStringField(w, 2, "hello")
    Protobuf.encodeMessageField(w, 3, inner.result())
    Protobuf.encodeVarintField(w, 4, 1L)
    Protobuf.encodeVarintField(w, 4, 2L) // repeated

    val node = Protobuf.decodeMessage(w.result())
    assert(node.get("f1").asLong == 150L)
    assert(node.get("f2").asText == "hello")
    assert(node.get("f3").get("f1").asLong == 7L)
    assert(node.get("f3").get("f2").asText == "world")
    assert(node.get("f4").isArray && node.get("f4").size == 2)
  }

  test("delimited stream reads one row per message via Spark") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("pb-spec")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-pb")
    val stream = new ByteWriter()
    for (i <- 1 to 3) {
      val m = new ByteWriter()
      Protobuf.encodeVarintField(m, 1, i.toLong)
      Protobuf.encodeStringField(m, 2, s"msg$i")
      val bytes = m.result()
      stream.writeVarInt(bytes.length)
      stream.writeBytes(bytes)
    }
    java.nio.file.Files.write(dir.resolve("stream.bin"), stream.result())
    val df = Protobuf.readDelimited(spark, dir.toString)
    assert(df.count() == 3)
    assert(df.select("f2").collect().map(_.getString(0)).toSet == Set("msg1", "msg2", "msg3"))
  }
}
