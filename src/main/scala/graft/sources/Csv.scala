package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** CSV read/write with the reference's task semantics mapped onto Spark's
  * native (codegen'd, pushdown-capable) CSV source.
  *
  * Reference: csv/CsvToIon.java:78-381 (header resolution incl. empty-header
  * DROP/RENAME policy :304-351, `\N`→null :240-251, skipRows :217-221,
  * onBadLines :200-210) and csv/IonToCsv.java:115-327 (quote modes).
  */
object Csv {

  /** onBadLines ≙ reference OnBadLines.java:6-19 */
  sealed trait OnBadLines { def sparkMode: String }
  case object Error extends OnBadLines { val sparkMode = "FAILFAST" }
  case object Warn extends OnBadLines { val sparkMode = "PERMISSIVE" }
  case object Skip extends OnBadLines { val sparkMode = "DROPMALFORMED" }

  /** onEmptyHeader ≙ csv/CsvToIon.java:304-351 */
  sealed trait OnEmptyHeader
  case object DropColumn extends OnEmptyHeader
  case object RenameColumn extends OnEmptyHeader

  final case class CsvReadOptions(
      header: Boolean = true,
      fieldSeparator: String = ",",
      textDelimiter: String = "\"",
      charset: String = "UTF-8",
      skipEmptyRows: Boolean = false,
      skipRows: Int = 0,
      nullValue: String = "\\N",
      onBadLines: OnBadLines = Error,
      onEmptyHeader: OnEmptyHeader = DropColumn,
      multiLine: Boolean = false,
      // parser limits ≙ csv/CsvToIon.java:152-168: maxFieldSize caps one
      // field's characters (univocity maxCharsPerColumn — which also bounds
      // the parse buffer, covering the reference's maxBufferSize failure
      // mode of a runaway unterminated quote); allowExtraCharsAfterClosingQuote
      // keeps reading a value past its closing quote instead of stopping at it
      maxFieldSize: Int = 16 * 1024 * 1024, // reference default, :79-80
      allowExtraCharsAfterClosingQuote: Boolean = false)

  def read(spark: SparkSession, path: String, opts: CsvReadOptions = CsvReadOptions()): DataFrame = {
    val reader = spark.read
      .option("header", opts.header)
      .option("sep", opts.fieldSeparator)
      .option("quote", opts.textDelimiter)
      .option("encoding", opts.charset)
      .option("nullValue", opts.nullValue)
      .option("mode", opts.onBadLines.sparkMode)
      .option("multiLine", opts.multiLine)
      .option("ignoreLeadingWhiteSpace", false)
      .option("ignoreTrailingWhiteSpace", false)
      .option("maxCharsPerColumn", opts.maxFieldSize)
      // ≙ fastcsv: extra chars after a closing quote throw by default
      // (false). With true, univocity salvages the RAW text between
      // delimiters (quote chars kept verbatim), where fastcsv appends the
      // extra chars to the unquoted value — both recover the row; the
      // salvaged cell keeps its quotes here. Documented divergence.
      .option("unescapedQuoteHandling",
        if (opts.allowExtraCharsAfterClosingQuote) "STOP_AT_DELIMITER"
        else "RAISE_ERROR")

    val df =
      if (opts.skipRows == 0) reader.csv(path)
      else {
        // no native skipRows: drop the first N physical lines OF EACH FILE,
        // then parse (reference: csv/CsvToIon.java:217-221 — per input
        // file). One task per file, streaming within it: "first N lines" is
        // a per-file, byte-order notion, so a global sort (or a
        // monotonically_increasing_id anchor, whose order equals file order
        // only by accident of split planning) is the wrong tool.
        import spark.implicits._
        val skipN = opts.skipRows
        val charset = opts.charset
        val root = new org.apache.hadoop.fs.Path(path)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val files: Seq[String] =
          if (fs.getFileStatus(root).isDirectory)
            fs.listStatus(root)
              .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
                !s.getPath.getName.startsWith("."))
              .map(_.getPath.toString).sorted.toSeq
          else Seq(root.toString)
        // canonical header = the first file's line skipN+1, captured
        // driver-side (a small bounded read of one file's head)
        val headerLine: Option[String] =
          if (!opts.header || files.isEmpty) None
          else {
            val p0 = new org.apache.hadoop.fs.Path(files.head)
            val in0 = new java.io.BufferedReader(new java.io.InputStreamReader(
              p0.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p0),
              opts.charset))
            try {
              var i = 0
              var l = in0.readLine()
              while (i < skipN && l != null) { l = in0.readLine(); i += 1 }
              Option(l)
            } finally in0.close()
          }
        val dropPerFile = skipN + (if (opts.header) 1 else 0)
        // session hadoop settings (credentials, endpoints) must reach the
        // executors — a bare `new Configuration()` there would lose them
        val confKv = {
          val it = spark.sparkContext.hadoopConfiguration.iterator()
          val b = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
          while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
          b.toArray
        }
        val lines = files.toDS()
          .repartition(math.max(1, files.length))
          .flatMap { f =>
            val conf = new org.apache.hadoop.conf.Configuration(false)
            confKv.foreach { case (k, v) => conf.set(k, v) }
            val p = new org.apache.hadoop.fs.Path(f)
            val in = new java.io.BufferedReader(new java.io.InputStreamReader(
              p.getFileSystem(conf).open(p), charset))
            // close on task end too: early-terminating consumers (limit)
            // abandon the iterator before EOF
            Option(org.apache.spark.TaskContext.get()).foreach(
              _.addTaskCompletionListener[Unit](_ =>
                try in.close() catch { case _: java.io.IOException => }))
            new Iterator[String] {
              private var nextLine = advance()
              private def advance(): String = {
                val l = in.readLine()
                if (l == null) { in.close(); null } else l
              }
              def hasNext: Boolean = nextLine != null
              def next(): String = { val l = nextLine; nextLine = advance(); l }
            }.drop(dropPerFile)
          }
        // With header=true, each FILE's header is dropped by POSITION above
        // (Spark's csv(Dataset) would only drop lines byte-equal to the
        // dataset's first line — a second file whose header differs in
        // spacing or column order would otherwise survive as a data row)
        // and ONE canonical header — the first file's — is prepended as its
        // own leading partition, so csv()'s first() is deterministic.
        val withHeader = headerLine match {
          case Some(h) => spark.createDataset(Seq(h)).union(lines)
          case None => lines
        }
        reader.csv(withHeader)
      }

    val cleaned = if (!opts.skipEmptyRows) df else {
      df.where(df.columns.map(c => col(c).isNotNull).reduce(_ || _))
    }
    // the empty-header policy is about header CELLS — with header=false
    // every column is legitimately Spark-named _cN (positional), and
    // applying DROP would delete the whole frame
    if (opts.header) applyEmptyHeaderPolicy(cleaned, opts.onEmptyHeader)
    else cleaned
  }

  /** empty/duplicate header cells: DROP the column or RENAME to col_N
    * (reference: csv/CsvToIon.java:304-351; Spark auto-names blank headers
    * `_cN`, which we treat as the empty-header case)
    */
  private def applyEmptyHeaderPolicy(df: DataFrame, policy: OnEmptyHeader): DataFrame = {
    val empties = df.columns.zipWithIndex.filter { case (c, _) =>
      c.isEmpty || c.matches("_c\\d+")
    }
    if (empties.isEmpty) df
    else policy match {
      case DropColumn => df.drop(empties.map(_._1): _*)
      case RenameColumn =>
        empties.foldLeft(df) { case (d, (c, i)) => d.withColumnRenamed(c, s"col_${i + 1}") }
    }
  }

  /** quote modes ≙ csv/IonToCsv.java:281-326 (ALWAYS / REQUIRED / NON_NUMERIC) */
  sealed trait QuoteMode
  case object QuoteAlways extends QuoteMode
  case object QuoteRequired extends QuoteMode
  case object QuoteNonNumeric extends QuoteMode

  final case class CsvWriteOptions(
      header: Boolean = true,
      fieldSeparator: String = ",",
      textDelimiter: String = "\"",
      charset: String = "UTF-8",
      quoteMode: QuoteMode = QuoteRequired,
      nullValue: String = "")

  def write(df: DataFrame, path: String, opts: CsvWriteOptions = CsvWriteOptions()): Unit =
    if (opts.quoteMode == QuoteNonNumeric) writeNonNumeric(df, path, opts)
    else df.write
      .option("header", opts.header)
      .option("sep", opts.fieldSeparator)
      .option("quote", opts.textDelimiter)
      .option("encoding", opts.charset)
      .option("quoteAll", opts.quoteMode == QuoteAlways)
      .option("nullValue", opts.nullValue)
      .option("emptyValue", "\"\"")
      .mode("overwrite")
      .csv(path)

  /** NON_NUMERIC strategy ≙ csv/IonToCsv.java:287-317: a VALUE is left
    * unquoted iff it is numeric (optional sign, digits, ≤1 decimal point —
    * per-value, not per-column-type). Spark's CSV writer has no per-value
    * quote strategy, so the line is assembled as a codegen'd expression and
    * written as text (header prepended per file, matching csv writer files).
    */
  private def writeNonNumeric(df: DataFrame, path: String, opts: CsvWriteOptions): Unit = {
    import df.sparkSession.implicits._
    val q = opts.textDelimiter
    // sign then ≥1 char, digits with at most one '.' (the reference's loop
    // accepts "1.", ".5" and even "." — mirrored by the structure below)
    val numericRe = "^[+-]?(?=[0-9.])[0-9]*\\.?[0-9]*$"
    val cells = df.schema.fields.map { f =>
      val s = col(f.name).cast("string")
      val quoted = concat(lit(q), replace(s, lit(q), lit(q + q)), lit(q))
      when(s.isNull, lit(opts.nullValue))
        .when(s.rlike(numericRe), s)
        .otherwise(quoted)
    }
    val line = concat_ws(opts.fieldSeparator, cells.toIndexedSeq: _*)
    val headerLine = df.columns
      .map(c => q + c.replace(q, q + q) + q)
      .mkString(opts.fieldSeparator)
    val lines = df.select(line.as("value")).as[String]
    val withHeader =
      if (!opts.header) lines
      else lines.mapPartitions(it =>
        if (it.hasNext) Iterator(headerLine) ++ it else it)
    withHeader.write.mode("overwrite").text(path)
  }
}
