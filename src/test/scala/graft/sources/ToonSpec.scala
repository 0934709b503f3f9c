package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** TOON cases taken from the reference's observable behavior
  * (JsonToToonTest / ToonToJsonTest fixtures).
  */
class ToonSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()
  private def j(s: String) = mapper.readTree(s)

  private def assertRender(json: String, toon: String): Unit =
    assert(Toon.render(j(json)).trim == toon.trim)

  private def assertParse(toon: String, json: String): Unit =
    assert(Toon.parse(toon) == j(json))

  private def assertRoundTrip(json: String): Unit =
    assert(Toon.parse(Toon.render(j(json))) == j(json))

  test("simple object") {
    val json = """{"id":123,"name":"Ada","active":true}"""
    val toon = "id: 123\nname: Ada\nactive: true"
    assertRender(json, toon)
    assertParse(toon, json)
  }

  test("tabular array of uniform objects") {
    val json =
      """{"users":[{"id":1,"name":"Alice","active":true},
        |{"id":2,"name":"Bob","active":false}]}""".stripMargin
    val toon = "users[2]{id,name,active}:\n  1,Alice,true\n  2,Bob,false"
    assertRender(json, toon)
    assertParse(toon, json)
  }

  test("mixed array with list items") {
    val json = """{"items":[1,{"a":"x"},"hello"]}"""
    val toon = "items[3]:\n  - 1\n  - a: x\n  - hello"
    assertRender(json, toon)
    assertParse(toon, json)
  }

  test("nested objects and inline primitive arrays") {
    val json = """{"server":{"host":"localhost","port":8080,"tags":["web","api"]}}"""
    val toon = "server:\n  host: localhost\n  port: 8080\n  tags[2]: web,api"
    assertRender(json, toon)
    assertParse(toon, json)
  }

  test("quoting of values with colons / separators") {
    val json =
      """{"urls":[{"id":1,"url":"http://a:b"},{"id":2,"url":"https://example.com?q=a:b"}]}"""
    val toon =
      "urls[2]{id,url}:\n  1,\"http://a:b\"\n  2,\"https://example.com?q=a:b\""
    assertRender(json, toon)
    assertParse(toon, json)
  }

  test("empty array and null") {
    val json = """{"tags":[],"note":null}"""
    val toon = "tags[0]:\nnote: null"
    assertRender(json, toon)
    assertParse(toon, json)
  }

  test("unicode stays plain") {
    val json = """{"message":"Hello 世界 👋","tags":["🎉","🎊","🎈"]}"""
    val toon = "message: Hello 世界 👋\ntags[3]: 🎉,🎊,🎈"
    assertRender(json, toon)
    assertParse(toon, json)
  }

  test("canonical numbers: no exponent, -0 -> 0") {
    assert(Toon.scalar(j("""{"x":1.5e2}""").get("x")) == "150")
    assert(Toon.scalar(j("""{"x":-0.0}""").get("x")) == "0")
    assert(Toon.scalar(j("""{"x":0.25}""").get("x")) == "0.25")
  }

  test("strings that look typed get quoted") {
    assert(Toon.quoteIfNeeded("true") == "\"true\"")
    assert(Toon.quoteIfNeeded("42") == "\"42\"")
    assert(Toon.quoteIfNeeded("null") == "\"null\"")
    assert(Toon.quoteIfNeeded("plain words") == "plain words")
    assert(Toon.quoteIfNeeded("a,b") == "\"a,b\"")
    assertRoundTrip("""{"s":"true","n":"42","q":"say \"hi\"","b":"back\\slash"}""")
  }

  test("newlines in strings and unsafe keys round-trip") {
    // a raw newline inside quotes would split the document into a line the
    // parser cannot read; keys with ':'/'['/',' must quote symmetrically
    assertRoundTrip("""{"s":"line1\nline2","t":"a\rb","u":"tail\n"}""")
    assertRoundTrip("""{"a:b":1,"k[3]":"v","x,y":true,"":"empty key"}""")
    assertRoundTrip("""{"rows":[{"a:c":1,"nl":"p\nq"},{"a:c":2,"nl":"r"}]}""")
    // adjacent escapes decode in one pass (sequential replace mis-decodes)
    assertRoundTrip("""{"e":"\\\"","f":"\\n literal-backslash-n"}""")
  }

  test("deep round-trips") {
    assertRoundTrip(
      """{"a":{"b":{"c":[1,2,3],"d":[{"x":1,"y":"u"},{"x":2,"y":"v"}]}},
        |"list":[{"k":"v","n":[{"p":1,"q":2}]},42,"str",null],
        |"empty":[],"nul":null,"neg":-5}""".stripMargin)
  }

  test("spark read / write integration") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("toon-spec")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-toon").toString
    val df = Seq((1L, "Ada", true), (2L, "Bob", false)).toDF("id", "name", "active")
    Toon.toToonDocs(df).coalesce(1).write.mode("overwrite").text(s"$dir/docs")
    // each row rendered as its own document: parse one back
    val doc = Toon.toToonDocs(df).collect().head
    assert(Toon.parse(doc).get("name") != null)
  }
}
