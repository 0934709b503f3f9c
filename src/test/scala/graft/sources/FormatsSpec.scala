package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Format round-trip tests mirroring the reference's fullconversion suite
  * (reference: avro/infer/fullconversion/FullIonConversionAbstractTest
  * .java:21-158): in → encode → decode → out must equal in, across
  * CSV / JSONL / JSON-array / YAML / XML / Avro / Parquet.
  */
class FormatsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-formats-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-fmt").toString

  private def fixture = {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Seq(
      (1L, "alice", 3.5, true, "hello, \"quoted\" text"),
      (2L, "bob", -0.25, false, "line with ; separators"),
      (3L, null.asInstanceOf[String], 1e10, true, ""),
      (4L, "daria", 0.0, false, "unicode: 多语言 🚀")
    ).toDF("id", "name", "score", "flag", "note")
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(df.columns.sorted.map(col): _*)
      .collect().map(_.toString).sorted.toSeq

  test("csv round-trip with quoting and nulls") {
    val dir = tmp()
    val df = fixture
    Csv.write(df, s"$dir/csv", Csv.CsvWriteOptions(quoteMode = Csv.QuoteAlways))
    val back = Csv.read(spark, s"$dir/csv", Csv.CsvReadOptions(nullValue = ""))
    val coerced = Coerce.frame(back, df.schema.asInstanceOf[StructType],
      Coerce.CoerceOptions(nullValues = Seq()))
    // CSV cannot distinguish null from "" — the reference collapses both to
    // null too (its nullValues list includes ""); expect that normalization
    val expected = df.withColumn("note",
      when(col("note") === "", lit(null)).otherwise(col("note")))
    assert(sortedRows(coerced) == sortedRows(expected))
  }

  test("csv skipRows + empty-header rename policy") {
    val dir = tmp()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in/f.csv"),
      "garbage line\nanother\nid,,name\n1,x,alice\n2,y,bob\n")
    val df = Csv.read(spark, s"$dir/in",
      Csv.CsvReadOptions(skipRows = 2, onEmptyHeader = Csv.RenameColumn))
    assert(df.columns.toSeq == Seq("id", "col_2", "name"))
    assert(df.count() == 2)
    val dropped = Csv.read(spark, s"$dir/in",
      Csv.CsvReadOptions(skipRows = 2, onEmptyHeader = Csv.DropColumn))
    assert(dropped.columns.toSeq == Seq("id", "name"))
  }

  test("csv parser limits: maxFieldSize caps a field, extra-chars knob") {
    val dir = tmp()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in/f.csv"),
      s"id,blob\n1,${"x" * 100}\n2,short\n")
    // within the limit: parses fine
    assert(Csv.read(spark, s"$dir/in",
      Csv.CsvReadOptions(maxFieldSize = 200)).count() == 2)
    // over the limit: the scan fails loudly — same contract as the
    // reference's fastcsv, whose maxFieldSize overflow throws regardless
    // of the bad-lines policy (it is a parser limit, not a malformed row)
    intercept[Exception] {
      Csv.read(spark, s"$dir/in",
        Csv.CsvReadOptions(maxFieldSize = 10)).collect()
    }

    // extra characters after a closing quote: the default throws (the
    // reference's fastcsv default); the allow knob salvages the raw cell
    // text up to the next delimiter (quote chars kept — see Csv.read note)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in2.csv"),
      "id,v,w\n1,\"ab\"cd,tail\n")
    intercept[Exception] {
      Csv.read(spark, s"$dir/in2.csv", Csv.CsvReadOptions()).collect()
    }
    val loose = Csv.read(spark, s"$dir/in2.csv",
      Csv.CsvReadOptions(allowExtraCharsAfterClosingQuote = true))
    assert(loose.head().getString(1) == "\"ab\"cd")
    assert(loose.head().getString(2) == "tail")
  }

  test("jsonl and json-array round-trips") {
    val dir = tmp()
    val df = fixture
    Json.writeJsonl(df, s"$dir/jsonl")
    val backL = Json.read(spark, s"$dir/jsonl", newLine = true)
    assert(sortedRows(backL.select(df.columns.map(col): _*)) == sortedRows(df))

    Json.writeJsonArray(df, s"$dir/jarr")
    val backA = Json.read(spark, s"$dir/jarr", newLine = false)
    assert(sortedRows(backA.select(df.columns.map(col): _*)) == sortedRows(df))
  }

  test("json writer timeZoneId renders timestamps in the requested zone") {
    // ≙ reference json/IonToJson.java:391-397: timestamps format through a
    // DateTimeFormatter zoned to the task's timeZoneId — same instant, zone
    // wall clock + offset in the text, round-trips to the identical instant
    val dir = tmp()
    import spark.implicits._
    val df = Seq((1L, java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-15T12:00:00Z")))).toDF("id", "ts")
    Json.writeJsonl(df, s"$dir/ny", timeZoneId = Some("America/New_York"))
    val text = spark.read.textFile(s"$dir/ny").collect().mkString("\n")
    assert(text.contains("07:00:00"), s"NY wall clock expected in: $text")
    assert(text.contains("-05:00"), s"NY offset expected in: $text")
    val back = Json.read(spark, s"$dir/ny", newLine = true)
      .select(col("ts").cast("timestamp")).head().getTimestamp(0)
    assert(back.toInstant == java.time.Instant.parse("2024-01-15T12:00:00Z"))
    // array writer path (to_json options)
    Json.writeJsonArray(df, s"$dir/nya", timeZoneId = Some("America/New_York"))
    val arrText = spark.read.textFile(s"$dir/nya").collect().mkString("\n")
    assert(arrText.contains("07:00:00") && arrText.contains("-05:00"), arrText)
    // default stays session-zone (UTC here): no offset suffix change
    Json.writeJsonl(df, s"$dir/utc")
    val utcText = spark.read.textFile(s"$dir/utc").collect().mkString("\n")
    assert(utcText.contains("12:00:00"), utcText)
  }

  test("yaml multi-document round-trip") {
    val dir = tmp()
    val df = fixture
    Yaml.write(df, s"$dir/yaml")
    val back = Yaml.read(spark, s"$dir/yaml")
    assert(back.count() == 4)
    assert(sortedRows(back.select(df.columns.map(col): _*)) == sortedRows(df))
  }

  test("xml query extraction and round-trip") {
    val dir = tmp()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in/cat.xml"),
      """<catalog><book id="a"><title>T1</title><price>10</price></book>
        |<book id="b"><title>T2</title><price>20</price><tag>x</tag><tag>y</tag></book>
        |<other>skip me</other></catalog>""".stripMargin)
    val books = Xml.read(spark, s"$dir/in", "/catalog/book")
    assert(books.count() == 2)
    assert(books.columns.contains("id") && books.columns.contains("title"))
    assert(books.where(col("id") === "b").select(size(col("tag"))).first().getInt(0) == 2)

    val df = fixture
    Xml.write(df, s"$dir/out", rootName = "rows")
    val back = Xml.read(spark, s"$dir/out", "/rows/row")
    assert(back.count() == 4)
  }

  test("avro container round-trip with deflate codec (schema from file)") {
    val dir = tmp()
    val df = fixture
    Avro.write(df, s"$dir/avro", codec = "deflate")
    val back = Avro.read(spark, s"$dir/avro")
    assert(sortedRows(back.select(df.columns.map(col): _*)) == sortedRows(df))
  }

  test("avro read-side onBadLines: ERROR throws, SKIP/WARN salvage the prefix") {
    val dir = tmp()
    val df = fixture
    Avro.write(df.repartition(1), s"$dir/avro", codec = "null")
    // corrupt the container's data block structurally — mirrors the
    // reference's bad-record fixtures (avro/AvroToIon.java:160-169
    // ERROR/WARN/SKIP on decode). The block starts right after the header's
    // sync marker (== the file's last 16 bytes); 12 bytes of 0xFF there form
    // an invalid >10-byte varint. (Plain truncation is NOT detectable: avro
    // treats a partial trailing block as clean EOF.)
    val f = new java.io.File(s"$dir/avro").listFiles()
      .filter(_.getName.endsWith(".avro")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val sync = java.util.Arrays.copyOfRange(bytes, bytes.length - 16, bytes.length)
    val syncPos = (0 until bytes.length - 32).find(i =>
      java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, i, i + 16), sync)).get
    for (k <- (syncPos + 18) until (syncPos + 30)) bytes(k) = 0xFF.toByte
    java.nio.file.Files.write(f.toPath, bytes)
    val err = intercept[org.apache.spark.SparkException] {
      Avro.read(spark, s"$dir/avro", Avro.ErrorOnBad).count()
    }
    // typed taxonomy: the root failure is an IllegalRowException
    def causes(t: Throwable): Iterator[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
    assert(causes(err).exists(c =>
      c.isInstanceOf[SerdeErrors.IllegalRowException] ||
        c.getMessage.contains("illegal row")))
    // SKIP and WARN keep whatever decodes cleanly before the corruption
    val skipped = Avro.read(spark, s"$dir/avro", Avro.SkipOnBad).count()
    assert(skipped < 4, s"corrupt tail must drop records, got $skipped")
    assert(Avro.read(spark, s"$dir/avro", Avro.WarnOnBad).count() == skipped)
  }

  test("avro rewrite of the same path has overwrite semantics") {
    val dir = tmp()
    // 4-partition write, then a smaller 1-partition rewrite: stale part
    // files from the first write must not survive and be read back
    Avro.write(fixture.repartition(4), s"$dir/avro", codec = "null")
    Avro.write(fixture.limit(2).repartition(1), s"$dir/avro", codec = "null")
    assert(Avro.read(spark, s"$dir/avro").count() == 2)
  }

  test("csv skipRows drops each file's header by position, not equality") {
    import spark.implicits._
    val dir = tmp()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    // file B's header differs in spacing — equality-based dedupe (Spark's
    // csv(Dataset) default) would keep it as a data row
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/a.csv"),
      "meta\nid,name\n1,x\n2,y\n".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/b.csv"),
      "meta\nid, name\n3,z\n".getBytes("UTF-8"))
    val got = Csv.read(spark, s"$dir/in",
      Csv.CsvReadOptions(header = true, skipRows = 1))
    assert(got.count() == 3, got.collect().mkString("; "))
    assert(got.columns.toSeq == Seq("id", "name"))
    assert(got.as[(String, String)].collect().toSet ==
      Set(("1", "x"), ("2", "y"), ("3", "z")))
  }

  test("parquet round-trip with reference knobs (gzip, dictionary, v2)") {
    val dir = tmp()
    val df = fixture
    Parquet.write(df, s"$dir/pq", Parquet.ParquetWriteOptions())
    val back = Parquet.read(spark, s"$dir/pq")
    assert(sortedRows(back) == sortedRows(df))
  }

  test("cross-format conversion chain: csv -> jsonl -> yaml -> parquet") {
    val dir = tmp()
    val df = fixture
    Csv.write(df, s"$dir/csv", Csv.CsvWriteOptions(quoteMode = Csv.QuoteAlways))
    val csv = Csv.read(spark, s"$dir/csv", Csv.CsvReadOptions(nullValue = ""))
    Json.writeJsonl(csv, s"$dir/jsonl")
    val jsonl = Json.read(spark, s"$dir/jsonl")
    Yaml.write(jsonl, s"$dir/yaml")
    val yaml = Yaml.read(spark, s"$dir/yaml")
    Parquet.write(yaml, s"$dir/pq")
    val end = Parquet.read(spark, s"$dir/pq")
    assert(end.count() == 4)
    assert(end.select("name").collect().map(_.getString(0)).toSet
      .contains("alice"))
  }

  test("csv NON_NUMERIC quote mode quotes per value, not per type") {
    import spark.implicits._
    val df = Seq(("abc", "12.5", "1.2.3"), ("+7", "-", ".5"))
      .toDF("a", "b", "c")
    val dir = java.nio.file.Files.createTempDirectory("graft-csv-nn").toString
    Csv.write(df.coalesce(1), s"$dir/csv",
      Csv.CsvWriteOptions(quoteMode = Csv.QuoteNonNumeric))
    val lines = spark.read.text(s"$dir/csv").collect().map(_.getString(0)).toSet
    assert(lines.contains("\"a\",\"b\",\"c\"")) // header quoted (non-numeric)
    assert(lines.contains("\"abc\",12.5,\"1.2.3\"")) // two dots → quoted
    assert(lines.contains("+7,\"-\",.5")) // sign-only → quoted; ".5" numeric
  }

  test("xml forceList keeps single children as arrays") {
    val xml =
      """<catalog>
        |  <book><title>One</title><tag>x</tag></book>
        |  <book><title>Two</title><tag>x</tag><tag>y</tag></book>
        |</catalog>""".stripMargin
    val plain = Xml.extractJson(xml, "/catalog/book")
    // without forceList the single-tag book is a plain string field
    assert(plain.head.contains("\"tag\":\"x\""))
    val forced = Xml.extractJson(xml, "/catalog/book", Set("tag"))
    assert(forced.head.contains("\"tag\":[\"x\"]"))
    assert(forced(1).contains("\"tag\":[\"x\",\"y\"]"))
  }

  test("htmlToMarkdown honors ignoreTags and baseUri") {
    val html =
      """<nav>skip me</nav><h1>Title</h1>
        |<p>See <a href="/docs/page">docs</a> and
        |<a href="https://other.example/x">abs</a>.</p>
        |<img alt="pic" src="img/p.png"/>""".stripMargin
    val md = Markdown.htmlToMarkdown(html,
      ignoreTags = Seq("nav"), baseUri = "https://example.com/root/")
    assert(!md.contains("skip me"))
    assert(md.contains("[docs](https://example.com/docs/page)"))
    assert(md.contains("[abs](https://other.example/x)")) // untouched
    assert(md.contains("![pic](https://example.com/root/img/p.png)"))
  }
}
