package graft.sources

import java.time.LocalDate
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Excel (.xlsx) reader/writer spec, mirroring the reference fixtures'
  * behaviors (excel/ExcelToIonTest.java + IonToExcelTest.java): round-trip
  * of typed cells, header/skipRows semantics, missing cells → null, date
  * render modes, multi-sheet workbooks, and sharedStrings decoding.
  */
class ExcelSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("graft-excel-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-excel").toString

  test("column ref helpers invert each other") {
    assert(Excel.colOf("A1") == 0)
    assert(Excel.colOf("Z9") == 25)
    assert(Excel.colOf("AA3") == 26)
    assert(Excel.colOf("BC23") == 54)
    for (i <- 0 until 1000) assert(Excel.colOf(Excel.colName(i) + "1") == i)
  }

  test("1900-system serial dates round-trip incl. the leap-bug boundary") {
    assert(Excel.serialToDate(1.0) == LocalDate.of(1900, 1, 1))
    assert(Excel.serialToDate(59.0) == LocalDate.of(1900, 2, 28))
    assert(Excel.serialToDate(61.0) == LocalDate.of(1900, 3, 1))
    assert(Excel.serialToDate(45748.0) == LocalDate.of(2025, 4, 1))
    for (d <- Seq(LocalDate.of(1901, 1, 1), LocalDate.of(2025, 4, 1),
      LocalDate.of(1999, 12, 31)))
      assert(Excel.serialToDate(Excel.dateToSerial(d).toDouble) == d)
  }

  test("date format code detection") {
    assert(Excel.isDateFormatCode("yyyy-mm-dd"))
    assert(Excel.isDateFormatCode("h:mm AM/PM"))
    assert(Excel.isDateFormatCode("yyyy-mm-dd hh\"h\"mm"))
    assert(!Excel.isDateFormatCode("#,##0.00"))
    assert(!Excel.isDateFormatCode("0.00E+00"))
    assert(!Excel.isDateFormatCode("\"yes m\";@")) // quoted m is literal
  }

  test("typed round-trip through a written workbook") {
    import spark.implicits._
    val df = Seq(
      ("alpha", 1L, 1.5, true, "2025-04-01"),
      ("bé<ta> & \"q\"", -42L, 30.102261, false, "2024-12-31"),
      ("gamma", 0L, 0.25, true, "1999-01-02")
    ).toDF("name", "n", "x", "flag", "d")
      .withColumn("d", to_date(col("d")))
    val dir = tmpDir()
    val file = s"$dir/book.xlsx"
    val n = Excel.writeSingleFile(Seq("Data" -> df), file)
    assert(n == 3)

    val back = Excel.read(spark, file)
    assert(back.count() == 3)
    assert(back.columns.sorted.toSeq == Seq("d", "flag", "n", "name", "x"))
    val rows = back.orderBy("name").collect()
    val r0 = rows.find(_.getAs[String]("name") == "alpha").get
    assert(r0.getAs[Double]("n") == 1.0) // numbers come back as doubles
    assert(r0.getAs[Double]("x") == 1.5)
    assert(r0.getAs[Boolean]("flag"))
    assert(r0.getAs[String]("d") == "2025-04-01") // UNFORMATTED date = ISO string
    val r1 = rows.find(_.getAs[String]("name").startsWith("bé")).get
    assert(r1.getAs[String]("name") == "bé<ta> & \"q\"") // XML escaping survives
    assert(r1.getAs[Double]("x") == 30.102261)
    assert(!r1.getAs[Boolean]("flag"))
  }

  test("SERIAL_NUMBER date render returns the raw serial") {
    import spark.implicits._
    val df = Seq(Tuple1("2025-04-01")).toDF("d").withColumn("d", to_date(col("d")))
    val dir = tmpDir()
    Excel.writeSingleFile(Seq("S" -> df), s"$dir/d.xlsx")
    val back = Excel.read(spark, s"$dir/d.xlsx",
      Excel.ExcelReadOptions(dateTimeRender = Excel.SerialNumber))
    assert(back.head().getAs[Double]("d") == 45748.0)
  }

  test("header=false yields positional columns; skipRows drops leading rows") {
    import spark.implicits._
    val df = Seq(("h1", "h2"), ("a", "b"), ("c", "d")).toDF("c1", "c2")
    val dir = tmpDir()
    Excel.writeSingleFile(Seq("S" -> df), s"$dir/h.xlsx",
      Excel.ExcelWriteOptions(header = false))
    val noHeader = Excel.read(spark, s"$dir/h.xlsx",
      Excel.ExcelReadOptions(header = false))
    assert(noHeader.columns.toSeq.sorted == Seq("col_000", "col_001"))
    assert(noHeader.count() == 3)
    // header + skipRows=1: row 2 ("a","b") becomes the header
    val skipped = Excel.read(spark, s"$dir/h.xlsx",
      Excel.ExcelReadOptions(header = true, skipRows = 1))
    assert(skipped.columns.sorted.toSeq == Seq("a", "b"))
    assert(skipped.count() == 1)
  }

  test("multi-sheet workbook: names listed, sheets filtered and read") {
    import spark.implicits._
    val df1 = Seq(("x", 1L)).toDF("k", "v")
    val df2 = Seq(("y", 2L), ("z", 3L)).toDF("k", "v")
    val dir = tmpDir()
    val file = s"$dir/multi.xlsx"
    Excel.writeSingleFile(Seq("First" -> df1, "Second" -> df2), file)
    assert(Excel.sheetNames(spark, file) == Seq("First", "Second"))
    val sheets = Excel.readSheets(spark, file,
      Excel.ExcelReadOptions(sheets = Seq("Second"))).toMap
    assert(sheets.keySet == Set("Second"))
    assert(sheets("Second").count() == 2)

    // single-pass tagged read: all sheets in one DataFrame, one unzip
    val tagged = Excel.readTagged(spark, file)
    assert(tagged.count() == 3)
    assert(tagged.where(org.apache.spark.sql.functions.col("_sheet") === "First")
      .count() == 1)
    assert(tagged.select("_sheet").distinct().as[String].collect().sorted.toSeq ==
      Seq("First", "Second"))
  }

  test("missing cells and a fully missing column read as null") {
    // hand-built sheet xml: B column absent on row 3, C empty everywhere
    val dir = tmpDir()
    import spark.implicits._
    val df = Seq(("k1", "v1", null.asInstanceOf[String]),
      ("k2", null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("A", "PrizeValue", "PrizeMasterType")
    Excel.writeSingleFile(Seq("S" -> df), s"$dir/m.xlsx")
    val back = Excel.read(spark, s"$dir/m.xlsx")
    val r = back.where(col("A") === "k2").head()
    assert(r.isNullAt(r.fieldIndex("PrizeValue")))
    // a never-populated column header still appears, all nulls
    assert(back.where(col("PrizeMasterType").isNotNull).count() == 0)
  }

  test("sharedStrings (t=\"s\") and rich runs decode") {
    // hand-assemble a minimal workbook that uses the shared-string table,
    // which our writer never emits (it writes inlineStr) — reader must
    // still handle files produced by real Excel
    val shared =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2">
        |<si><t>plain</t></si>
        |<si><r><t>ri</t></r><r><t>ch</t></r></si>
        |</sst>""".stripMargin
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>7</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val wb =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin
    val dir = tmpDir()
    val f = new java.io.File(s"$dir/shared.xlsx")
    val z = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(f))
    def add(name: String, c: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(c.getBytes("UTF-8")); z.closeEntry()
    }
    add("xl/workbook.xml", wb)
    add("xl/_rels/workbook.xml.rels", rels)
    add("xl/sharedStrings.xml", shared)
    add("xl/worksheets/sheet1.xml", sheet)
    z.close()

    val back = Excel.read(spark, f.toString)
    assert(back.columns.sorted.toSeq == Seq("plain", "rich"))
    val r = back.head()
    assert(r.getAs[String]("plain") == "rich")
    assert(r.getAs[Double]("rich") == 7.0)
  }

  test("duplicate headers disambiguate; headerless ragged rows keep columns") {
    import Excel._
    // duplicate header texts must not collapse columns (last-wins data loss)
    val dup = renderRows(Seq(
      Array[CellV](CStr("x"), CStr("x"), CStr("y")),
      Array[CellV](CStr("1"), CStr("2"), CStr("3"))),
      ExcelReadOptions(header = true))
    assert(dup.length == 1)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(dup.head)
    assert(node.get("x").asText() == "1")
    assert(node.get("x_1").asText() == "2")
    assert(node.get("y").asText() == "3")

    // header=false: the window must cover the WIDEST row (xlsx omits
    // trailing blanks, so the first row's width says nothing)
    val ragged = renderRows(Seq(
      Array[CellV](CStr("a"), CStr("b")),
      Array[CellV](CStr("c"), CStr("d"), CStr("e"), CStr("f"))),
      ExcelReadOptions(header = false))
    val row2 = new com.fasterxml.jackson.databind.ObjectMapper().readTree(ragged(1))
    assert(row2.get("col_003").asText() == "f",
      s"wide-row columns truncated: ${ragged(1)}")
  }
}
