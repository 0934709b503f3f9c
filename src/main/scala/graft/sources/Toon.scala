package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** TOON 3.0 (token-oriented object notation) parser + encoder, written from
  * the format's observable grammar (reference behavior:
  * json/ToonToJson.java:100-619 and json/JsonToToon.java:99-759; syntax
  * exercised by JsonToToonTest/ToonToJsonTest):
  *
  *   key: value                    scalar field
  *   key:                          nested object (fields indented +2)
  *   key[N]: a,b,c                 inline primitive array (N items)
  *   key[0]:                       empty array
  *   key[N]{f1,f2}:                tabular array of uniform objects,
  *     v1,v2                       one CSV row per element
  *   key[N]:                       mixed/list array,
  *     - item                      scalar / object list entries
  *
  * Values quote with double quotes (\" and \\ escapes) when they contain
  * the separator/colon/quotes/newlines or would parse as number/bool/null.
  * Numbers render canonically: no exponent, -0 → 0 (JsonToToon.java:644-659).
  */
object Toon {

  private val mapper = new ObjectMapper()

  // ---------------------------------------------------------------- encode

  def render(node: JsonNode): String = {
    val sb = new StringBuilder
    renderObject(node, 0, sb)
    sb.toString
  }

  private def renderObject(node: JsonNode, indent: Int, sb: StringBuilder): Unit = {
    node.properties().forEach { e =>
      renderField(e.getKey, e.getValue, indent, sb)
    }
  }

  private def renderField(rawKey: String, v: JsonNode, indent: Int, sb: StringBuilder): Unit = {
    val pad = " " * indent
    val key = quoteKey(rawKey)
    if (v.isArray) {
      val arr = v.asInstanceOf[ArrayNode]
      val n = arr.size
      if (n == 0) sb ++= s"$pad$key[0]:\n"
      else if (isPrimitiveArray(arr)) {
        val items = (0 until n).map(i => scalar(arr.get(i)))
        sb ++= s"$pad$key[$n]: ${items.mkString(",")}\n"
      } else if (uniformObjectFields(arr).isDefined) {
        val fields = uniformObjectFields(arr).get
        sb ++= s"$pad$key[$n]{${fields.map(quoteKey).mkString(",")}}:\n"
        (0 until n).foreach { i =>
          val row = fields.map(f => scalar(arr.get(i).get(f)))
          sb ++= s"$pad  ${row.mkString(",")}\n"
        }
      } else {
        sb ++= s"$pad$key[$n]:\n"
        (0 until n).foreach { i =>
          val item = arr.get(i)
          if (item.isObject) {
            val props = item.properties().iterator()
            var first = true
            props.forEachRemaining { e =>
              if (first) { renderListField(e.getKey, e.getValue, indent + 2, sb, leader = true); first = false }
              else renderField(e.getKey, e.getValue, indent + 4, sb)
            }
            if (first) sb ++= s"$pad  -\n" // empty object item
          } else sb ++= s"$pad  - ${scalar(item)}\n"
        }
      }
    } else if (v.isObject) {
      sb ++= s"$pad$key:\n"
      renderObject(v, indent + 2, sb)
    } else sb ++= s"$pad$key: ${scalar(v)}\n"
  }

  /** first field of an object list item, rendered after the "- " leader */
  private def renderListField(key: String, v: JsonNode, indent: Int, sb: StringBuilder,
      leader: Boolean): Unit = {
    val tmp = new StringBuilder
    renderField(key, v, 0, tmp)
    val lines = tmp.toString.split("\n", -1).filter(_.nonEmpty)
    val pad = " " * indent
    sb ++= s"$pad- ${lines.head}\n"
    lines.tail.foreach(l => sb ++= s"$pad  $l\n")
  }

  private def isPrimitiveArray(arr: ArrayNode): Boolean =
    (0 until arr.size).forall(i => !arr.get(i).isContainerNode)

  /** Some(fields) when every element is an object with the SAME key set and
    * only primitive values (the tabular form precondition,
    * json/JsonToToon.java:316-343)
    */
  private def uniformObjectFields(arr: ArrayNode): Option[Seq[String]] = {
    if (arr.size == 0) return None
    val first = arr.get(0)
    if (!first.isObject) return None
    val fields = {
      val b = Seq.newBuilder[String]
      first.fieldNames().forEachRemaining(b += _)
      b.result()
    }
    val ok = (0 until arr.size).forall { i =>
      val e = arr.get(i)
      e.isObject && {
        val names = {
          val b = Seq.newBuilder[String]
          e.fieldNames().forEachRemaining(b += _)
          b.result()
        }
        names == fields && fields.forall(f => !e.get(f).isContainerNode)
      }
    }
    if (ok) Some(fields) else None
  }

  private[sources] def scalar(v: JsonNode): String = {
    if (v == null || v.isNull) "null"
    else if (v.isBoolean) v.asBoolean.toString
    else if (v.isNumber) canonicalNumber(v)
    else quoteIfNeeded(v.asText)
  }

  /** no exponent, -0 → 0 (JsonToToon.java:644-659) */
  private def canonicalNumber(v: JsonNode): String = {
    if (v.isIntegralNumber) v.bigIntegerValue.toString
    else {
      val bd = new java.math.BigDecimal(v.asText).stripTrailingZeros
      val plain = bd.toPlainString
      if (plain == "-0" || plain == "-0.0") "0" else plain
    }
  }

  private val needsQuote = "[,:\"\\[\\]{}#]|^\\s|\\s$|[\\n\\r]".r

  /** escape for a double-quoted TOON string: backslash, quote, and the
    * line breaks — an unescaped newline inside quotes would split the
    * document into a line the parser cannot read back
    */
  private def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r")

  /** single-pass inverse of `escape` (sequential String.replace calls
    * mis-decode adjacent escapes like \\\")
    */
  private def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb += '\n'
          case 'r' => sb += '\r'
          case other => sb += other // \" and \\ (and pass-through)
        }
        i += 2
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private[sources] def quoteIfNeeded(s: String): String = {
    val looksTyped = s == "null" || s == "true" || s == "false" ||
      s.matches("-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?") || s.isEmpty ||
      s.startsWith("- ") || s == "-"
    if (looksTyped || needsQuote.findFirstIn(s).isDefined)
      "\"" + escape(s) + "\""
    else s
  }

  /** object keys quote under the same rules as values (the parser already
    * reads quoted keys); a raw ':'/'['/',' in a key would otherwise split
    * at the wrong place or parse as an array header
    */
  private def quoteKey(k: String): String =
    if (k.isEmpty || needsQuote.findFirstIn(k).isDefined) "\"" + escape(k) + "\""
    else k

  // ----------------------------------------------------------------- parse

  def parse(text: String): JsonNode = {
    val lines = text.split("\n", -1).toIndexedSeq
      .filter(l => l.trim.nonEmpty)
      .map(l => (l.takeWhile(_ == ' ').length, l.trim))
    val (node, consumed) = parseObject(lines, 0, if (lines.isEmpty) 0 else lines.head._1)
    require(consumed == lines.length, s"trailing TOON content at line $consumed")
    node
  }

  private val headerRe = "^(\"(?:[^\"\\\\]|\\\\.)*\"|[^:\\[]+)\\[(\\d+)\\](\\{([^}]*)\\})?:\\s*(.*)$".r
  private val fieldRe = "^(\"(?:[^\"\\\\]|\\\\.)*\"|[^:]+):\\s*(.*)$".r

  private def parseObject(lines: IndexedSeq[(Int, String)], start: Int, indent: Int): (ObjectNode, Int) = {
    val obj = mapper.createObjectNode()
    var i = start
    while (i < lines.length && lines(i)._1 >= indent) {
      val (ind, line) = lines(i)
      require(ind == indent, s"unexpected indent $ind (wanted $indent) at: $line")
      line match {
        case headerRe(rawKey, nStr, _, fieldsStr, rest) =>
          val key = unquoteKey(rawKey.trim)
          val n = nStr.toInt
          val arr = mapper.createArrayNode()
          if (fieldsStr != null) {
            // tabular rows
            val fields = splitCsv(fieldsStr).map(f => unquoteKey(f.trim))
            i += 1
            var r = 0
            while (r < n) {
              require(i < lines.length && lines(i)._1 > indent, s"missing tabular row for $key")
              val cells = splitCsv(lines(i)._2)
              val row = mapper.createObjectNode()
              fields.zip(cells).foreach { case (f, c) =>
                row.set[JsonNode](f, scalarNode(c.trim)); ()
              }
              arr.add(row)
              i += 1; r += 1
            }
          } else if (rest.nonEmpty) {
            // inline primitive array
            splitCsv(rest).foreach(c => arr.add(scalarNode(c.trim)))
            i += 1
          } else if (n == 0) {
            i += 1
          } else {
            // list array: "- item" entries
            i += 1
            var r = 0
            while (r < n) {
              require(i < lines.length && lines(i)._1 > indent && lines(i)._2.startsWith("-"),
                s"missing list item for $key")
              val itemIndent = lines(i)._1
              val afterDash = lines(i)._2.drop(1).trim
              afterDash match {
                case "" =>
                  arr.add(mapper.createObjectNode()); i += 1
                case q if q.startsWith("\"") => // quoted scalar, not a field
                  arr.add(scalarNode(q)); i += 1
                case fieldRe(_, _) | headerRe(_, _, _, _, _) =>
                  // object item: first field on the dash line, rest indented +2
                  val rewritten = (itemIndent + 2, afterDash) +:
                    lines.drop(i + 1).takeWhile(l => l._1 >= itemIndent + 2 && !(l._1 == itemIndent && l._2.startsWith("-")))
                  val (o, consumed) = parseObject(rewritten.toIndexedSeq, 0, itemIndent + 2)
                  arr.add(o)
                  i += consumed // dash line + (consumed - 1) following lines
                case scalarText =>
                  arr.add(scalarNode(scalarText)); i += 1
              }
              r += 1
            }
          }
          obj.set[JsonNode](key, arr)
        case fieldRe(rawKey, rest) =>
          val key = unquoteKey(rawKey.trim)
          if (rest.isEmpty) {
            val (child, next) = parseObject(lines, i + 1, indent + 2)
            obj.set[JsonNode](key, child)
            i = next - 1
          } else obj.set[JsonNode](key, scalarNode(rest))
          i += 1
        case other => throw new IllegalArgumentException(s"unparseable TOON line: $other")
      }
    }
    (obj, i)
  }

  private def unquoteKey(k: String): String =
    if (k.startsWith("\"") && k.endsWith("\"") && k.length >= 2)
      unescape(k.substring(1, k.length - 1))
    else k

  /** split on commas, honoring double quotes with backslash escapes */
  private[sources] def splitCsv(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) {
        if (c == '\\' && i + 1 < s.length) { cur += c += s.charAt(i + 1); i += 1 }
        else { if (c == '"') inQ = false; cur += c }
      } else if (c == '"') { inQ = true; cur += c }
      else if (c == ',') { out += cur.toString; cur.clear() }
      else cur += c
      i += 1
    }
    out += cur.toString
    out.result()
  }

  private[sources] def scalarNode(raw: String): JsonNode = {
    val f = mapper.getNodeFactory
    if (raw.startsWith("\"") && raw.endsWith("\"") && raw.length >= 2)
      f.textNode(unescape(raw.substring(1, raw.length - 1)))
    else if (raw == "null") f.nullNode()
    else if (raw == "true") f.booleanNode(true)
    else if (raw == "false") f.booleanNode(false)
    else if (raw.matches("-?\\d+")) {
      try {
        val l = raw.toLong
        if (l >= Int.MinValue && l <= Int.MaxValue) f.numberNode(l.toInt) else f.numberNode(l)
      } catch { case _: NumberFormatException => f.numberNode(new java.math.BigDecimal(raw)) }
    } else if (raw.matches("-?\\d+\\.\\d+([eE][+-]?\\d+)?"))
      f.numberNode(new java.math.BigDecimal(raw).doubleValue())
    else f.textNode(raw)
  }

  // ------------------------------------------------------------- Spark I/O

  /** one row per TOON document file */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val json = spark.read.option("wholetext", true).text(path)
      .as[String]
      .map(t => mapper.writeValueAsString(parse(t)))
    spark.read.json(json)
  }

  /** each row → one TOON document (a Dataset of documents) */
  def toToonDocs(df: DataFrame): Dataset[String] = {
    import df.sparkSession.implicits._
    df.toJSON.map(j => render(mapper.readTree(j)))
  }
}
