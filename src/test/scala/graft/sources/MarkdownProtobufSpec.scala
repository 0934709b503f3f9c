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

  test("nested and ordered lists render with proper nesting") {
    val html = Markdown.toHtml(
      "- a\n  - a1\n  - a2\n- b\n\n1. one\n2. two")
    assert(html.contains("<li>a<ul>\n<li>a1</li>\n<li>a2</li>\n</ul>\n</li>"),
      html)
    assert(html.contains("<ol>\n<li>one</li>\n<li>two</li>\n</ol>"), html)
  }

  test("reference links resolve in toHtml and toText") {
    val md = "See [the spec][ref] and [Plain][].\n\n[ref]: http://spec.io\n[plain]: http://p.io"
    val html = Markdown.toHtml(md)
    assert(html.contains("<a href=\"http://spec.io\">the spec</a>"), html)
    assert(html.contains("<a href=\"http://p.io\">Plain</a>"), html)
    val text = Markdown.toText(md)
    assert(text.contains("the spec") && !text.contains("http://spec.io"))
    assert(!text.contains("[ref]:"))
  }

  test("blockquote, rule, and raw-HTML block passthrough") {
    val html = Markdown.toHtml("> quoted\n> more\n\n---\n\n<table><tr/></table>")
    assert(html.contains("<blockquote>\n<p>quoted</p>\n<p>more</p>\n</blockquote>"), html)
    assert(html.contains("<hr/>"), html)
    assert(html.contains("<table><tr/></table>"), html)
    // spaced-dash thematic break beats list interpretation (commonmark)
    assert(Markdown.toHtml("- - -") == "<hr/>", Markdown.toHtml("- - -"))
  }

  test("html tables convert to GFM pipe tables") {
    val md = Markdown.htmlToMarkdown(
      """<table><thead><tr><th>Name</th><th>Age</th></tr></thead>
        |<tbody><tr><td>Alice</td><td>30</td></tr>
        |<tr><td>Bob</td><td>25</td></tr></tbody></table>""".stripMargin)
    assert(md.contains("| Name | Age |"), md)
    assert(md.contains("|---|---|"), md)
    assert(md.contains("| Alice | 30 |") && md.contains("| Bob | 25 |"), md)
    // cells with markup and literal pipes stay one row
    val md2 = Markdown.htmlToMarkdown(
      "<table><tr><th>k</th></tr><tr><td><strong>a</strong> x|y</td></tr></table>")
    assert(md2.contains("| **a** x\\|y |"), md2)
  }

  test("definition lists convert to the term/colon form") {
    val md = Markdown.htmlToMarkdown(
      "<dl><dt>Spark</dt><dd>an engine</dd><dt>Graft</dt><dd>a codec</dd></dl>")
    assert(md.contains("Spark\n: an engine"), md)
    assert(md.contains("Graft\n: a codec"), md)
  }

  test("entity decoding: named, numeric, and amp-last ordering") {
    val md = Markdown.htmlToMarkdown(
      "<p>&quot;q&quot; &apos;a&apos; &#39;b&#39; x&nbsp;y &#65;&#x42; &amp;lt; &amp; &#xZZ;</p>")
    assert(md.contains("\"q\" 'a' 'b' x y AB"), md)
    // &amp;lt; is the literal text "&lt;" — amp decodes LAST, not first
    assert(md.contains("&lt;"), md)
    assert(!md.contains("&amp;"), md)
    assert(md.contains("&#xZZ;"), md) // malformed numeric entity kept as-is
    // surrogate code points are not UTF-8-encodable; HTML decodes them to
    // U+FFFD — an unpaired surrogate would make getBytes("UTF-8") lossy
    val sur = Markdown.htmlToMarkdown("<p>a&#xD800;b &#55296; c&#x10FFFF;</p>")
    assert(sur.contains("a�b �"), sur)
    assert(sur.contains("c" + new String(Character.toChars(0x10FFFF))), sur)
    assert(new String(sur.getBytes("UTF-8"), "UTF-8") == sur, "round-trippable UTF-8")
  }

  test("html ordered lists and blockquotes invert to markdown") {
    val md = Markdown.htmlToMarkdown(
      "<ol><li>first</li><li>second</li></ol>" +
        "<blockquote><p>qa</p><p>qb</p></blockquote><hr/>")
    assert(md.contains("1. first") && md.contains("2. second"), md)
    assert(md.contains("> qa") && md.contains("> qb"), md)
    assert(md.contains("---"), md)
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

  // ---- descriptor-set resolution (≙ ProtobufTools + typeName decode) ----

  import graft.codec.ByteWriter

  private def msgBytes(build: ByteWriter => Unit): Array[Byte] = {
    val w = new ByteWriter(64)
    build(w)
    w.result()
  }

  private def vint(w: ByteWriter, field: Int, v: Long): Unit =
    Protobuf.encodeVarintField(w, field, v)
  private def s(w: ByteWriter, field: Int, v: String): Unit =
    Protobuf.encodeStringField(w, field, v)
  private def m(w: ByteWriter, field: Int, b: Array[Byte]): Unit =
    Protobuf.encodeMessageField(w, field, b)

  /** FieldDescriptorProto {1:name 3:number 4:label 5:type 6:type_name} */
  private def fieldDesc(name: String, number: Int, label: Int, tpe: Int,
      typeName: String = ""): Array[Byte] = msgBytes { w =>
    s(w, 1, name); vint(w, 3, number); vint(w, 4, label); vint(w, 5, tpe)
    if (typeName.nonEmpty) s(w, 6, typeName)
  }

  /** hand-assembled addressbook-style descriptor set: test.Person with a
    * nested PhoneNumber message and PhoneType enum (descriptor.proto is
    * public; the set is itself a protobuf message → decoder bootstraps it)
    */
  private def personDescriptorSet: Array[Byte] = {
    val phoneType = msgBytes { w => // EnumDescriptorProto
      s(w, 1, "PhoneType")
      m(w, 2, msgBytes { v => s(v, 1, "MOBILE"); vint(v, 2, 0) })
      m(w, 2, msgBytes { v => s(v, 1, "HOME"); vint(v, 2, 1) })
      m(w, 2, msgBytes { v => s(v, 1, "WORK"); vint(v, 2, 2) })
    }
    val phoneNumber = msgBytes { w => // DescriptorProto
      s(w, 1, "PhoneNumber")
      m(w, 2, fieldDesc("number", 1, 1, 9))
      m(w, 2, fieldDesc("ptype", 2, 1, 14, ".test.Person.PhoneType"))
    }
    val person = msgBytes { w =>
      s(w, 1, "Person")
      m(w, 2, fieldDesc("name", 1, 1, 9))
      m(w, 2, fieldDesc("id", 2, 1, 5))
      m(w, 2, fieldDesc("email", 3, 1, 9))
      m(w, 2, fieldDesc("phones", 4, 3, 11, ".test.Person.PhoneNumber"))
      m(w, 2, fieldDesc("scores", 5, 3, 17)) // repeated sint32
      m(w, 2, fieldDesc("ratio", 6, 1, 1)) // double
      m(w, 2, fieldDesc("active", 7, 1, 8)) // bool
      m(w, 3, phoneNumber)
      m(w, 4, phoneType)
    }
    val fileProto = msgBytes { w =>
      s(w, 1, "test.proto"); s(w, 2, "test"); m(w, 4, person)
    }
    msgBytes(w => m(w, 1, fileProto)) // FileDescriptorSet
  }

  test("unsigned protobuf types decode unsigned, never sign-extended") {
    import Descriptors._
    val desc = MessageD("t.U", Seq(
      FieldD("u32", 1, repeated = false, TUint32, ""),
      FieldD("u64", 2, repeated = false, TUint64, ""),
      FieldD("f32", 3, repeated = false, TFixed32, ""),
      FieldD("f64", 4, repeated = false, TFixed64, "")))
    val reg = Registry(Map("t.U" -> desc), Map.empty)
    val bytes = msgBytes { w =>
      vint(w, 1, 0xFFFFFFFFL)           // uint32 max → 4294967295, not -1
      vint(w, 2, -1L)                    // uint64 max → 18446744073709551615
      w.writeVarInt((3 << 3) | 5)        // fixed32, all-ones
      (0 until 4).foreach(_ => w.writeByte(0xFF))
      w.writeVarInt((4 << 3) | 1)        // fixed64, all-ones
      (0 until 8).foreach(_ => w.writeByte(0xFF))
    }
    val node = Protobuf.decodeWithDescriptor(bytes, desc, reg)
    assert(node.get("u32").asLong() == 4294967295L, node.get("u32"))
    assert(node.get("u64").bigIntegerValue().toString == "18446744073709551615")
    assert(node.get("f32").asLong() == 4294967295L, node.get("f32"))
    assert(node.get("f64").bigIntegerValue().toString == "18446744073709551615")
  }

  private def zigzag32(v: Int): Long = ((v << 1) ^ (v >> 31)).toLong & 0xffffffffL

  private def personMessage: Array[Byte] = msgBytes { w =>
    s(w, 1, "Alice")
    vint(w, 2, 123)
    s(w, 3, "alice@example.com")
    m(w, 4, msgBytes { p => s(p, 1, "555-1234"); vint(p, 2, 1) }) // HOME
    m(w, 4, msgBytes { p => s(p, 1, "555-9876"); vint(p, 2, 2) }) // WORK
    vint(w, 5, zigzag32(-3))
    vint(w, 5, zigzag32(7))
    // ratio = 2.5 (double, wire type 1, little-endian bits)
    w.writeVarLong((6L << 3) | 1)
    val bits = java.lang.Double.doubleToLongBits(2.5)
    for (k <- 0 until 8) w.writeByte(((bits >>> (8 * k)) & 0xff).toInt)
    vint(w, 7, 1) // active = true
  }

  test("descriptor set parses and resolves nested types by full name") {
    val reg = Descriptors.parseFileDescriptorSet(personDescriptorSet)
    assert(reg.messages.keySet ==
      Set("test.Person", "test.Person.PhoneNumber"))
    assert(reg.enums.keySet == Set("test.Person.PhoneType"))
    assert(Descriptors.find(reg, ".test.Person").isDefined)
    assert(Descriptors.find(reg, "test.Person.PhoneNumber").isDefined)
    val person = Descriptors.find(reg, "test.Person").get
    assert(person.fields.map(_.name) ==
      Seq("name", "id", "email", "phones", "scores", "ratio", "active"))
  }

  test("descriptor-driven decode: real names, enums, sints, doubles") {
    val reg = Descriptors.parseFileDescriptorSet(personDescriptorSet)
    val desc = Descriptors.find(reg, "test.Person").get
    val node = Protobuf.decodeWithDescriptor(personMessage, desc, reg)
    assert(node.get("name").asText() == "Alice")
    assert(node.get("id").asInt() == 123)
    assert(node.get("phones").size() == 2)
    assert(node.get("phones").get(0).get("number").asText() == "555-1234")
    assert(node.get("phones").get(0).get("ptype").asText() == "HOME")
    assert(node.get("phones").get(1).get("ptype").asText() == "WORK")
    assert(node.get("scores").get(0).asInt() == -3) // zigzag decoded
    assert(node.get("scores").get(1).asInt() == 7)
    assert(node.get("ratio").asDouble() == 2.5)
    assert(node.get("active").asBoolean())
  }

  test("delimited stream with descriptor reads named columns via Spark") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("graft-proto-desc-spec")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-proto-desc")
    val w = new ByteWriter(256)
    val one = personMessage
    w.writeVarInt(one.length); w.writeBytes(one)
    w.writeVarInt(one.length); w.writeBytes(one)
    java.nio.file.Files.write(dir.resolve("people.bin"), w.result())
    val df = Protobuf.readDelimitedWithDescriptor(
      spark, dir.toString, personDescriptorSet, "test.Person")
    assert(df.count() == 2)
    assert(df.columns.sorted.toSeq ==
      Seq("active", "email", "id", "name", "phones", "ratio", "scores"))
    val r = df.head()
    assert(r.getAs[String]("name") == "Alice")
    assert(r.getAs[Seq[org.apache.spark.sql.Row]]("phones")
      .map(_.getAs[String]("ptype")).toSet == Set("HOME", "WORK"))
  }

  test("packed fixed-width repeateds decode as 4/8-byte LE records, not varints") {
    // message Packed { repeated fixed32 f32 = 1; repeated sfixed32 sf32 = 2;
    //                  repeated fixed64 f64 = 3; repeated sfixed64 sf64 = 4; }
    val packed = msgBytes { w =>
      s(w, 1, "Packed")
      m(w, 2, fieldDesc("f32", 1, 3, 7)) // TFixed32
      m(w, 2, fieldDesc("sf32", 2, 3, 15)) // TSfixed32
      m(w, 2, fieldDesc("f64", 3, 3, 6)) // TFixed64
      m(w, 2, fieldDesc("sf64", 4, 3, 16)) // TSfixed64
    }
    val fileProto = msgBytes { w =>
      s(w, 1, "packed.proto"); s(w, 2, "test"); m(w, 4, packed)
    }
    val set = msgBytes(w => m(w, 1, fileProto))
    val reg = Descriptors.parseFileDescriptorSet(set)
    val desc = Descriptors.find(reg, "test.Packed").get

    def le(w: ByteWriter, v: Long, bytes: Int): Unit =
      for (k <- 0 until bytes) w.writeByte(((v >>> (8 * k)) & 0xff).toInt)
    val msg = msgBytes { w =>
      // values chosen so a varint misread would desync: 300 has bit 8 set,
      // -2 is all-ones in two's complement
      w.writeVarLong((1L << 3) | 2); w.writeVarInt(8)
      le(w, 300L, 4); le(w, 7L, 4)
      w.writeVarLong((2L << 3) | 2); w.writeVarInt(4)
      le(w, -2L & 0xffffffffL, 4)
      w.writeVarLong((3L << 3) | 2); w.writeVarInt(16)
      le(w, 1L << 40, 8); le(w, 5L, 8)
      w.writeVarLong((4L << 3) | 2); w.writeVarInt(8)
      le(w, -3L, 8)
    }
    val node = Protobuf.decodeWithDescriptor(msg, desc, reg)
    assert(node.get("f32").get(0).asLong() == 300L)
    assert(node.get("f32").get(1).asLong() == 7L)
    assert(node.get("sf32").get(0).asInt() == -2)
    assert(node.get("f64").get(0).asLong() == (1L << 40))
    assert(node.get("f64").get(1).asLong() == 5L)
    assert(node.get("sf64").get(0).asLong() == -3L)
  }

  test("errorOnUnknownFields: throw vs keep f<number>") {
    val reg = Descriptors.parseFileDescriptorSet(personDescriptorSet)
    val desc = Descriptors.find(reg, "test.Person").get
    val withUnknown = msgBytes { w =>
      s(w, 1, "Bob")
      vint(w, 99, 42) // field 99 not in the descriptor
    }
    val lenient = Protobuf.decodeWithDescriptor(withUnknown, desc, reg)
    assert(lenient.get("name").asText() == "Bob")
    assert(lenient.get("f99").asLong() == 42L)
    val e = intercept[SerdeErrors.IllegalCellException] {
      Protobuf.decodeWithDescriptor(withUnknown, desc, reg,
        errorOnUnknownFields = true)
    }
    assert(e.getMessage.contains("unknown field number 99"))
    assert(e.field == "f99")
  }

  test("writeDelimited + built descriptor set round-trips a DataFrame") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("graft-proto-rt-spec")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = Seq((1L, "alpha beta", "en"), (2L, "gamma", "fr"), (3L, "delta", "en"))
      .toDF("id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft-proto-rt").toString
    Protobuf.writeDelimited(df, s"$dir/pb")
    val set = Protobuf.buildFileDescriptorSet("t", "Row",
      Protobuf.schemaDescriptorFields(df.schema))
    val back = Protobuf.readDelimitedWithDescriptor(spark, s"$dir/pb", set, "t.Row",
      errorOnUnknownFields = true)
    assert(back.count() == 3)
    assert(back.columns.sorted.toSeq == Seq("id", "lang", "text"))
    assert(back.where(org.apache.spark.sql.functions.col("lang") === "en")
      .agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0) == 4L)
    assert(back.where($"id" === 1L).head().getAs[String]("text") == "alpha beta")
  }
}
