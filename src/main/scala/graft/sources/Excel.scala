package graft.sources

import java.io.{ByteArrayInputStream, OutputStream}
import java.time.LocalDate
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Excel (.xlsx) read/write built directly on the public OOXML container
  * format (ECMA-376: ZIP + SpreadsheetML XML parts) — no POI on this
  * classpath, so the ZIP comes from `java.util.zip` and the XML from the
  * same XXE-hardened StAX used by Xml.scala.
  *
  * Read ≙ reference excel/ExcelToIon.java:133-314 (per-sheet extraction,
  * header/skipRows/sheetsTitle, value render modes :254-313, date handling
  * per excel/DateTimeRender.java:3-7). Write ≙ excel/IonToExcel.java:
  * 192-330 (typed cells, optional header row, date styles). Rows are
  * parsed distributed: binaryFile → flatMap(file → JSON rows) →
  * spark.read.json, the same pivot Avro.scala uses.
  */
object Excel {

  // ≙ excel/ValueRender.java
  sealed trait ValueRender
  case object FormattedValue extends ValueRender
  case object UnformattedValue extends ValueRender
  case object FormulaRender extends ValueRender

  // ≙ excel/DateTimeRender.java
  sealed trait DateTimeRender
  case object SerialNumber extends DateTimeRender
  case object FormattedString extends DateTimeRender
  case object UnformattedDateTime extends DateTimeRender

  final case class ExcelReadOptions(
      header: Boolean = true,
      skipRows: Int = 0,
      skipEmptyRows: Boolean = false,
      /** empty → all sheets (≙ sheetsTitle) */
      sheets: Seq[String] = Nil,
      valueRender: ValueRender = UnformattedValue,
      dateTimeRender: DateTimeRender = UnformattedDateTime)

  // ------------------------------------------------------------------ read

  /** sheet names of the workbook(s) under `path` (first file wins) */
  def sheetNames(spark: SparkSession, path: String): Seq[String] = {
    val bytes = spark.read.format("binaryFile").load(path)
      .select("content").head().getAs[Array[Byte]](0)
    val parts = unzip(bytes)
    workbookSheets(parts).map(_._1)
  }

  /** the first (or only) selected sheet as a DataFrame */
  def read(spark: SparkSession, path: String,
      opts: ExcelReadOptions = ExcelReadOptions()): DataFrame =
    readSheets(spark, path, opts).head._2

  /** every selected sheet as its own DataFrame, keyed by sheet name —
    * the analog of the reference's per-sheet output map
    */
  def readSheets(spark: SparkSession, path: String,
      opts: ExcelReadOptions = ExcelReadOptions()): Seq[(String, DataFrame)] = {
    import spark.implicits._
    val names = sheetNames(spark, path)
      .filter(n => opts.sheets.isEmpty || opts.sheets.contains(n))
    val bin = spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
    names.map { sheet =>
      val o = opts
      val rows = bin.flatMap(bytes => sheetJsonRows(bytes, sheet, o))
      sheet -> spark.read.json(rows)
    }
  }

  /** single-pass variant: ALL selected sheets of every workbook in ONE
    * DataFrame, tagged by a `_sheet` column — the scale path for
    * many-sheet workbooks. `readSheets` hands back one DataFrame per
    * sheet, so each sheet's job re-inflates the ZIP and re-parses
    * sharedStrings/styles; here the workbook is unzipped once per file
    * and every sheet's rows stream out of that single pass.
    */
  def readTagged(spark: SparkSession, path: String,
      opts: ExcelReadOptions = ExcelReadOptions()): DataFrame = {
    import spark.implicits._
    val o = opts
    val rows = spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        val jm = new com.fasterxml.jackson.databind.ObjectMapper()
        val parts = unzip(bytes)
        val shared = sharedStrings(parts)
        val dateXfs = dateStyleXfs(parts)
        workbookSheets(parts).iterator
          .filter { case (name, _) => o.sheets.isEmpty || o.sheets.contains(name) }
          .flatMap { case (name, p) =>
            val tag = jm.writeValueAsString(
              jm.getNodeFactory.textNode(name)) // JSON-escaped sheet name
            renderRows(sheetRows(parts(p), shared, dateXfs), o)
              .map(json =>
                if (json == "{}") s"""{"_sheet":$tag}"""
                else s"""{"_sheet":$tag,${json.drop(1)}""")
          }
      }
    spark.read.json(rows)
  }

  /** parse one sheet of one workbook into JSON-object rows (serializable
    * worker-side function; pure except for the XML parser)
    */
  private[sources] def sheetJsonRows(
      bytes: Array[Byte], sheet: String, opts: ExcelReadOptions): Seq[String] = {
    val parts = unzip(bytes)
    val target = workbookSheets(parts).collectFirst {
      case (name, p) if name == sheet => p
    }
    target match {
      case None => Seq.empty
      case Some(p) =>
        val shared = sharedStrings(parts)
        val dateXfs = dateStyleXfs(parts)
        val rawRows = sheetRows(parts(p), shared, dateXfs)
        renderRows(rawRows, opts)
    }
  }

  /** raw parsed cell */
  private[sources] sealed trait CellV
  private[sources] case class CNum(v: Double, dateStyled: Boolean) extends CellV
  private[sources] case class CStr(s: String) extends CellV
  private[sources] case class CBool(b: Boolean) extends CellV
  private[sources] case object CBlank extends CellV

  private def xmlFactory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  private def unzip(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += (e.getName -> zin.readAllBytes())
      zin.closeEntry()
      e = zin.getNextEntry
    }
    zin.close()
    out.result()
  }

  /** workbook sheet list in declared order: (name, zip path of sheet xml) */
  private def workbookSheets(parts: Map[String, Array[Byte]]): Seq[(String, String)] = {
    // rels: rId -> target
    val rels = scala.collection.mutable.Map.empty[String, String]
    for (relBytes <- parts.get("xl/_rels/workbook.xml.rels")) {
      val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(relBytes))
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship") {
          val id = r.getAttributeValue(null, "Id")
          val t = r.getAttributeValue(null, "Target")
          if (id != null && t != null) rels(id) = normalizeTarget(t)
        }
      }
      r.close()
    }
    val out = Seq.newBuilder[(String, String)]
    var sheetNo = 0
    for (wb <- parts.get("xl/workbook.xml")) {
      val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(wb))
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          sheetNo += 1
          val name = Option(r.getAttributeValue(null, "name")).getOrElse(s"Sheet$sheetNo")
          val rid = (0 until r.getAttributeCount)
            .find(i => r.getAttributeLocalName(i) == "id")
            .map(r.getAttributeValue)
          val path = rid.flatMap(rels.get)
            .getOrElse(s"xl/worksheets/sheet$sheetNo.xml")
          if (parts.contains(path)) out += (name -> path)
        }
      }
      r.close()
    }
    out.result()
  }

  private def normalizeTarget(t: String): String =
    if (t.startsWith("/")) t.drop(1)
    else if (t.startsWith("xl/")) t
    else s"xl/$t"

  /** sharedStrings.xml → indexed strings (all <t> descendants of an <si>
    * concatenated — covers plain and rich-run strings)
    */
  private def sharedStrings(parts: Map[String, Array[Byte]]): Vector[String] = {
    parts.get("xl/sharedStrings.xml") match {
      case None => Vector.empty
      case Some(bytes) =>
        val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(bytes))
        val out = Vector.newBuilder[String]
        var cur: StringBuilder = null
        var inT = false
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "si" => cur = new StringBuilder
                case "t" => inT = true
                case _ =>
              }
            case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
              if (inT && cur != null) cur.append(r.getText)
            case XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "si" => out += cur.toString; cur = null
                case "t" => inT = false
                case _ =>
              }
            case _ =>
          }
        }
        r.close()
        out.result()
    }
  }

  /** builtin numFmtIds that are date/time formats (ECMA-376 §18.8.30) */
  private val BuiltinDateFmts: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** style (xf) indices whose number format is a date/time format */
  private def dateStyleXfs(parts: Map[String, Array[Byte]]): Set[Int] = {
    parts.get("xl/styles.xml") match {
      case None => Set.empty
      case Some(bytes) =>
        val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(bytes))
        val custom = scala.collection.mutable.Map.empty[Int, String]
        val xfFmts = scala.collection.mutable.ArrayBuffer.empty[Int]
        var inCellXfs = false
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "numFmt" =>
                  val id = Option(r.getAttributeValue(null, "numFmtId")).map(_.toInt)
                  val code = Option(r.getAttributeValue(null, "formatCode"))
                  for (i <- id; c <- code) custom(i) = c
                case "cellXfs" => inCellXfs = true
                case "xf" if inCellXfs =>
                  xfFmts += Option(r.getAttributeValue(null, "numFmtId"))
                    .map(_.toInt).getOrElse(0)
                case _ =>
              }
            case XMLStreamConstants.END_ELEMENT =>
              if (r.getLocalName == "cellXfs") inCellXfs = false
            case _ =>
          }
        }
        r.close()
        xfFmts.zipWithIndex.collect {
          case (fmtId, xf) if BuiltinDateFmts(fmtId) ||
            custom.get(fmtId).exists(isDateFormatCode) => xf
        }.toSet
    }
  }

  /** date-format heuristic on a custom format code: contains y/m/d/h/s
    * tokens outside quoted literals, color/[..] sections, and escapes
    */
  private[sources] def isDateFormatCode(code: String): Boolean = {
    val sb = new StringBuilder
    var i = 0
    var inQuote = false
    var inBracket = false
    while (i < code.length) {
      val c = code.charAt(i)
      if (inQuote) { if (c == '"') inQuote = false }
      else if (inBracket) { if (c == ']') inBracket = false }
      else c match {
        case '"' => inQuote = true
        case '[' => inBracket = true
        case '\\' => i += 1 // escaped literal char
        case _ => sb.append(c)
      }
      i += 1
    }
    val cleaned = sb.toString.toLowerCase
    cleaned.exists(c => c == 'y' || c == 'd' || c == 'h' || c == 's') ||
      (cleaned.contains('m') && !cleaned.contains('#') && !cleaned.contains('0'))
  }

  /** one worksheet xml → rows of (cells padded by column index). Rows
    * absent from the xml (fully empty) do not appear — same as the
    * reference's streaming row iterator.
    */
  private def sheetRows(
      bytes: Array[Byte],
      shared: Vector[String],
      dateXfs: Set[Int]): Seq[Array[CellV]] = {
    val r = xmlFactory.createXMLStreamReader(new ByteArrayInputStream(bytes))
    val rows = Seq.newBuilder[Array[CellV]]
    var row: scala.collection.mutable.ArrayBuffer[CellV] = null
    var colIdx = 0
    var cellType = ""
    var cellStyle = 0
    var cellCol = 0
    var inV = false
    var inIs = false
    var inT = false
    var text: StringBuilder = null
    def put(col: Int, v: CellV): Unit = {
      while (row.length <= col) row += CBlank
      row(col) = v
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              row = scala.collection.mutable.ArrayBuffer.empty[CellV]
              colIdx = 0
            case "c" if row != null =>
              val ref = r.getAttributeValue(null, "r")
              cellCol = if (ref != null) colOf(ref) else colIdx
              colIdx = cellCol + 1
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              cellStyle = Option(r.getAttributeValue(null, "s"))
                .map(_.toInt).getOrElse(0)
              text = new StringBuilder
            case "v" => inV = true
            case "is" => inIs = true
            case "t" if inIs => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if ((inV || inT) && text != null) text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" => inT = false
            case "is" => inIs = false
            case "c" if row != null =>
              val raw = if (text == null) "" else text.toString
              val v: CellV = cellType match {
                case "s" =>
                  val i = raw.trim.toInt
                  if (i >= 0 && i < shared.length) CStr(shared(i)) else CBlank
                case "str" | "inlineStr" => CStr(raw)
                case "b" => CBool(raw.trim == "1" || raw.trim == "true")
                case "e" => CBlank // error cells → null, like the reference
                case _ =>
                  if (raw.trim.isEmpty) CBlank
                  else CNum(raw.trim.toDouble, dateXfs(cellStyle))
              }
              put(cellCol, v)
              text = null
            case "row" =>
              if (row != null) rows += row.toArray
              row = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.result()
  }

  /** "BC23" → 0-based column index 54 */
  private[sources] def colOf(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** 0-based column index → "A".."Z","AA".. */
  private[sources] def colName(idx: Int): String = {
    var n = idx + 1
    val sb = new StringBuilder
    while (n > 0) {
      val r = (n - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  /** Excel 1900-system serial → LocalDate (leap-bug compatible: serials
    * ≥ 61 skip the fictitious 1900-02-29; ≙ excel/DateTimeRender handling
    * via POI DateUtil semantics)
    */
  private[sources] def serialToDate(serial: Double): LocalDate = {
    val whole = math.floor(serial).toLong
    LocalDate.of(1900, 1, 1).plusDays(whole - (if (whole >= 61) 2 else 1))
  }

  /** LocalDate → serial (inverse of serialToDate for dates ≥ 1900-03-01) */
  private[sources] def dateToSerial(d: LocalDate): Long =
    d.toEpochDay - LocalDate.of(1899, 12, 30).toEpochDay

  /** apply header/skipRows/render options; emit JSON object rows.
    * Header semantics ≙ ExcelToIon.java:169-197: with header, skipRows
    * extra rows are consumed and the LAST consumed row is the header;
    * the header row's width windows every data row; empty header cells
    * become "ColumnN".
    */
  private[sources] def renderRows(
      raw: Seq[Array[CellV]], opts: ExcelReadOptions): Seq[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def rendered(c: CellV): Any = renderCell(c, opts)

    var rows = raw
    var headers: Array[String] = null
    var firstCol = 0
    var lastCol = -1
    if (opts.header && rows.nonEmpty) {
      val headerRow = rows(math.min(opts.skipRows, rows.length - 1))
      rows = rows.drop(math.min(opts.skipRows, rows.length - 1) + 1)
      firstCol = headerRow.indexWhere(_ != CBlank) match {
        case -1 => 0
        case i => i
      }
      lastCol = headerRow.length
      headers = (firstCol until lastCol).map { i =>
        headerRow(i) match {
          case CBlank => s"Column$i"
          case c => String.valueOf(rendered(c))
        }
      }.toArray
      // duplicate header texts would collapse columns in the JSON object
      // (last writer wins, silent data loss) — disambiguate like spark's
      // own CSV reader does, by positional suffix
      val seen = scala.collection.mutable.Map.empty[String, Int]
      headers = headers.map { h =>
        val n = seen.getOrElse(h, 0)
        seen(h) = n + 1
        if (n == 0) h else s"${h}_$n"
      }
    } else if (!opts.header) {
      rows = rows.drop(opts.skipRows)
      // window on the WIDEST row: xlsx omits trailing blank cells from the
      // XML, so the first data row's width says nothing about later rows —
      // taking it would silently truncate their extra columns
      lastCol = if (rows.isEmpty) 0 else rows.iterator.map(_.length).max
    }

    val out = Seq.newBuilder[String]
    for (row <- rows) {
      val hi = if (lastCol == -1) row.length else lastCol
      val vals = (firstCol until hi).map(i =>
        if (i < row.length) rendered(row(i)) else null)
      val allNull = vals.forall(_ == null)
      if (!(opts.skipEmptyRows && allNull)) {
        val node = mapper.createObjectNode()
        vals.zipWithIndex.foreach { case (v, k) =>
          val name = if (headers != null) headers(k) else f"col_${firstCol + k}%03d"
          v match {
            case null => node.putNull(name)
            case s: String => node.put(name, s)
            case d: java.lang.Double => node.put(name, d.doubleValue())
            case b: java.lang.Boolean => node.put(name, b.booleanValue())
            case other => node.put(name, String.valueOf(other))
          }
        }
        out += mapper.writeValueAsString(node)
      }
    }
    out.result()
  }

  /** value render ≙ ExcelToIon.java:254-313 (FORMULA reads the cached
    * result, exactly like the reference's getCachedFormulaResultType path)
    */
  private[sources] def renderCell(c: CellV, opts: ExcelReadOptions): Any = c match {
    case CBlank => null
    case CStr(s) => s
    case CBool(b) =>
      if (opts.valueRender == FormattedValue) String.valueOf(b).toUpperCase
      else java.lang.Boolean.valueOf(b)
    case CNum(v, dateStyled) =>
      if (dateStyled) {
        opts.dateTimeRender match {
          case SerialNumber => java.lang.Double.valueOf(v)
          case FormattedString =>
            val d = serialToDate(v)
            val frac = v - math.floor(v)
            if (frac > 1e-9) {
              val secs = math.round(frac * 86400)
              d.atStartOfDay.plusSeconds(secs)
                .format(java.time.format.DateTimeFormatter
                  .ofPattern("yyyy-MM-dd HH:mm:ss"))
            } else d.toString
          case UnformattedDateTime => serialToDate(v).toString
        }
      } else if (opts.valueRender == FormattedValue) {
        // DataFormatter "General": integral doubles print without ".0"
        if (v == math.rint(v) && math.abs(v) < 1e15) math.round(v).toString
        else v.toString
      } else java.lang.Double.valueOf(v)
  }

  // ----------------------------------------------------------------- write

  final case class ExcelWriteOptions(
      sheetTitle: String = "Sheet",
      header: Boolean = true,
      /** date/timestamp cells get a date number format (≙ styles knob) */
      styles: Boolean = true)

  /** distributed export: one .xlsx per partition (like Avro.write) */
  def write(df: DataFrame, path: String,
      opts: ExcelWriteOptions = ExcelWriteOptions()): Unit = {
    val schema = df.schema
    SinkDirs.reset(df.sparkSession, path)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val out = new java.io.BufferedOutputStream(
          SinkDirs.create(path, f"part-$pid%05d.xlsx"))
        try writeWorkbook(out, Seq(opts.sheetTitle -> (schema, rows)), opts)
        finally out.close()
      }
      ()
    }
  }

  /** single-file export, optionally multiple sheets (≙ IonToExcel's map
    * form). Streams each sheet through toLocalIterator — bounded driver
    * memory; use `write` for the partition-parallel path.
    */
  def writeSingleFile(sheets: Seq[(String, DataFrame)], file: String,
      opts: ExcelWriteOptions = ExcelWriteOptions()): Long = {
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(file))
    var n = 0L
    try {
      n = writeWorkbook(out,
        sheets.map { case (name, df) =>
          val it = df.toLocalIterator()
          name -> (df.schema, new Iterator[Row] {
            def hasNext = it.hasNext
            def next() = it.next()
          })
        }, opts)
    } finally out.close()
    n
  }

  /** stream a workbook: returns total data rows written */
  private def writeWorkbook(
      os: OutputStream,
      sheets: Seq[(String, (StructType, Iterator[Row]))],
      opts: ExcelWriteOptions): Long = {
    val z = new ZipOutputStream(os)
    def entry(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    val n = sheets.length
    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        (1 to n).map(i =>
          s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString +
        """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
        """</Types>""")
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
        sheets.zipWithIndex.map { case ((name, _), i) =>
          s"""<sheet name="${escXml(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString +
        """</sheets></workbook>""")
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        (1 to n).map(i =>
          s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""").mkString +
        s"""<Relationship Id="rId${n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
        """</Relationships>""")
    // xf 0 = General, xf 1 = date (builtin 14), xf 2 = datetime (builtin 22)
    entry("xl/styles.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        """<fonts count="1"><font/></fonts><fills count="1"><fill/></fills>""" +
        """<borders count="1"><border/></borders>""" +
        """<cellStyleXfs count="1"><xf/></cellStyleXfs>""" +
        """<cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/><xf numFmtId="22" applyNumberFormat="1"/></cellXfs>""" +
        """</styleSheet>""")

    var total = 0L
    sheets.zipWithIndex.foreach { case ((_, (schema, rows)), si) =>
      z.putNextEntry(new ZipEntry(s"xl/worksheets/sheet${si + 1}.xml"))
      val w = new java.io.OutputStreamWriter(z, "UTF-8")
      w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      var rowAt = 1
      if (opts.header) {
        w.write(s"""<row r="$rowAt">""")
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          w.write(inlineStrCell(colName(i) + rowAt, f.name))
        }
        w.write("</row>")
        rowAt += 1
      }
      while (rows.hasNext) {
        val r = rows.next()
        w.write(s"""<row r="$rowAt">""")
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          if (!r.isNullAt(i)) {
            val ref = colName(i) + rowAt
            f.dataType match {
              case IntegerType | LongType | ShortType | ByteType =>
                w.write(s"""<c r="$ref"><v>${r.get(i)}</v></c>""")
              case FloatType | DoubleType | _: DecimalType =>
                w.write(s"""<c r="$ref"><v>${r.get(i)}</v></c>""")
              case BooleanType =>
                w.write(s"""<c r="$ref" t="b"><v>${if (r.getBoolean(i)) 1 else 0}</v></c>""")
              case DateType =>
                val serial = dateToSerial(r.getDate(i).toLocalDate)
                val s = if (opts.styles) """ s="1"""" else ""
                w.write(s"""<c r="$ref"$s><v>$serial</v></c>""")
              case TimestampType =>
                val ts = r.getTimestamp(i)
                val ld = ts.toLocalDateTime
                val serial = dateToSerial(ld.toLocalDate).toDouble +
                  ld.toLocalTime.toSecondOfDay / 86400.0
                val s = if (opts.styles) """ s="2"""" else ""
                w.write(s"""<c r="$ref"$s><v>$serial</v></c>""")
              case _ =>
                w.write(inlineStrCell(ref, String.valueOf(r.get(i))))
            }
          }
        }
        w.write("</row>")
        rowAt += 1
        total += 1
      }
      w.write("</sheetData></worksheet>")
      w.flush()
      z.closeEntry()
    }
    z.finish()
    total
  }

  private def inlineStrCell(ref: String, s: String): String =
    s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${escXml(s)}</t></is></c>"""

  private[sources] def escXml(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' =>
        sb.append(' ') // control chars are not representable in XML 1.0
      case c => sb.append(c)
    }
    sb.toString
  }
}
