package graft.queries

import graft.sources._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Format-conversion queries: drive the serde layer end-to-end on driver
  * tables (write → read → aggregate), DuckDB-checkable because a correct
  * round-trip must reproduce the original table's aggregates.
  */
object FormatQueries {
  import Tables._

  /** documents → CSV → infer+coerce read → per-lang aggregates */
  def csvRoundtripAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = Tables.scratchDir("graft-q-csv")
    // doc_id bounded below 1e6: the 100-row inference sample must never
    // say 'int' while later rows overflow the strict ANSI cast (the
    // aggregate below doesn't consume doc_id, but correctness should not
    // lean on the optimizer pruning the cast away)
    val docs = load(spark, sfDir, "documents")
      .withColumn("doc_id", pmod(col("doc_id"), lit(1000000)))
    Csv.write(docs, s"$dir/csv", Csv.CsvWriteOptions(quoteMode = Csv.QuoteAlways))
    val back = InferSchema.inferAndCoerce(
      Csv.read(spark, s"$dir/csv", Csv.CsvReadOptions(nullValue = "")),
      rowsToScan = 100)
    back.groupBy(col("lang"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("n_chars")).cast("long").as("total_chars"))
  }

  /** documents → JSONL → YAML stream → JSONL again (YamlToJson) → read →
    * per-source counts: the full JsonToYaml AND YamlToJson transcode chain
    * under one oracle — a lossy leg in either direction fails the
    * counts/chars hash
    */
  def yamlRoundtripAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = Tables.scratchDir("graft-q-yaml")
    val docs = load(spark, sfDir, "documents")
    Json.writeJsonl(docs, s"$dir/jsonl")
    Yaml.jsonToYaml(spark, s"$dir/jsonl", s"$dir/yaml")
    Yaml.yamlToJsonl(spark, s"$dir/yaml", s"$dir/jsonl2")
    Json.read(spark, s"$dir/jsonl2", newLine = true)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).cast("long").as("total_chars"))
  }

  /** documents → Avro(deflate, avro-java) → read → per-lang counts */
  def avroRoundtripAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = Tables.scratchDir("graft-q-avro")
    val docs = load(spark, sfDir, "documents")
    Avro.write(docs, s"$dir/avro", codec = "deflate")
    Avro.read(spark, s"$dir/avro")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).cast("long").as("total_chars"))
  }

  /** documents → xlsx (distributed, one workbook per partition) → read →
    * per-lang aggregates. Numeric cells come back as doubles (Excel cells
    * are IEEE doubles), so counts/sums are re-integerized for the oracle.
    */
  def excelRoundtripAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = Tables.scratchDir("graft-q-excel")
    val docs = load(spark, sfDir, "documents")
    Excel.write(docs, s"$dir/xlsx", Excel.ExcelWriteOptions(sheetTitle = "documents"))
    Excel.read(spark, s"$dir/xlsx")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("n_chars"))).cast("long").as("total_chars"))
  }

  /** documents → whole-file JSON array → JSONL transcode → JSONL read →
    * per-lang aggregates (covers IonToJson array form, JsonToJsonl,
    * JsonToIon; ref json/JsonToJsonl.java:103-191). `total_text_len` checks
    * content fidelity through the double transcode, not just row counts.
    */
  def jsonRoundtripAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = Tables.scratchDir("graft-q-json")
    val docs = load(spark, sfDir, "documents")
    Json.writeJsonArray(docs, s"$dir/array")
    Json.jsonToJsonl(spark, s"$dir/array", s"$dir/jsonl", newLine = false)
    Json.read(spark, s"$dir/jsonl")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        sum(length(col("text"))).cast("long").as("total_text_len"))
  }

  /** documents → one XML doc per partition → StAX path-query read →
    * per-lang aggregates (ref xml/IonToXml.java:88-171, XmlToIon.java:75-422)
    */
  def xmlRoundtripAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = Tables.scratchDir("graft-q-xml")
    val docs = load(spark, sfDir, "documents")
    Xml.write(docs, s"$dir/xml", rootName = "docs")
    Xml.read(spark, s"$dir/xml", query = "/docs/row")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("n_chars").cast("long")).as("total_chars"),
        sum(length(col("text"))).cast("long").as("total_text_len"))
  }

  /** documents → TOON documents (tabular form, one doc per partition) →
    * parse back → per-lang aggregates (ref json/JsonToToon.java:99-759,
    * ToonToJson.java:100-619 — byte-exact encode/parse means the original
    * aggregates must reappear)
    */
  def toonRoundtripAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = Tables.scratchDir("graft-q-toon")
    // round-robin repartition: every partition non-empty → one TOON doc per
    // output file (Toon.read parses whole files)
    val docs = load(spark, sfDir, "documents").repartition(4)
    val toonDocs = docs.toJSON.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val arr = mapper.createArrayNode()
        it.foreach(j => arr.add(mapper.readTree(j)))
        val root = mapper.createObjectNode()
        root.set[com.fasterxml.jackson.databind.JsonNode]("rows", arr)
        Iterator.single(Toon.render(root))
      }
    }
    toonDocs.write.mode("overwrite").text(s"$dir/toon")
    Toon.read(spark, s"$dir/toon")
      .select(explode(col("rows")).as("r"))
      .groupBy(col("r.lang").as("lang"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("r.n_chars")).cast("long").as("total_chars"),
        sum(length(col("r.text"))).cast("long").as("total_text_len"))
  }

  /** documents → length-delimited protobuf stream (one file per partition)
    * → descriptor-driven named-column read (strict unknown-field policy) →
    * per-lang aggregates (ref protobuf/ProtobufToIon.java:84-225)
    */
  def protobufRoundtripAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = Tables.scratchDir("graft-q-pb")
    val docs = load(spark, sfDir, "documents")
    Protobuf.writeDelimited(docs, s"$dir/pb")
    val descSet = Protobuf.buildFileDescriptorSet("graftq", "Doc",
      Protobuf.schemaDescriptorFields(docs.schema))
    Protobuf.readDelimitedWithDescriptor(spark, s"$dir/pb", descSet, "graftq.Doc",
        errorOnUnknownFields = true)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        sum(length(col("text"))).cast("long").as("total_text_len"))
  }

  /** markdown suite stats: documents rendered as markdown, stripped back to
    * plain text via the native MdToText expression, AND round-tripped
    * md → html → md → text (ref markdown/MarkdownToText.java:114-165,
    * MarkdownToHtml.java:93-95, HtmlToMarkdown.java:97-202). Both lengths
    * must equal len(lang) + 2 + len(text) — the DuckDB oracle recomputes
    * that from the original table, so a drifting renderer fails the hash.
    */
  def markdownStats(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.textFunctions.{htmlToMd, mdToHtml, mdToText}
    val docs = load(spark, sfDir, "documents")
    val md = concat(lit("# "), col("lang"), lit("\n\n"), col("text"))
    // same render/strip kernels as before (MdToText/MdToHtml/HtmlToMd call
    // Markdown.toText/toHtml/htmlToMarkdown), but as a pure codegen'd
    // expression chain — the old typed Dataset.map paid an encoder ser/de
    // round-trip per doc. Spark's length() counts codepoints
    // (UTF8String.numChars), exactly the old codePointCount (and DuckDB
    // len()) — identical on every input.
    docs
      .select(col("lang"),
        length(mdToText(md)).cast("long").as("txt_len"),
        length(mdToText(htmlToMd(mdToHtml(md)))).cast("long").as("rt_len"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(col("txt_len")).cast("long").as("total_txt_len"),
        sum(col("rt_len")).cast("long").as("total_rt_len"))
  }

  /** inferred schema of the CSV projection of documents (rows-only) */
  /** headerless positional CSV of mixed-type cells, driven end-to-end
    * through the coercion algebra: `Coerce.framePositional` (schema fields
    * zip input columns by index, missing trailing field → typed null),
    * `Coerce.cellUnion` (first target that converts wins per value), a
    * full-frame `InferSchema.infer` pre-pass (inferred simpleStrings are
    * emitted as columns, pinning the lattice), and WARN/SKIP bad-cell
    * counting (schema-directed int over cells that sometimes don't parse —
    * lax mode nulls them and the count is the reference's bad-lines tally).
    * ≙ reference avro/AvroConverter.java:197-216 (fromArray), :460-469
    * (complexUnion), :219-230 (inferAllFields), :629-717 + OnBadLines.java
    * :6-19 (counting WARN/SKIP).
    *
    * Inference samples up to 2^20 rows (it collects to the driver — it can
    * never scan 100 TB), so every derived column is constructed to infer
    * the SAME type from any sample of the table: c0 is bounded below 1e6
    * (always 'int'), c1/c2 mix types within every 35-consecutive-id window
    * (always 'string'). The oracle can then pin the types as constants
    * without mirroring the sample.
    */
  def coerceUnion(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val dir = Tables.scratchDir("graft-q-coerce")
    val docs = load(spark, sfDir, "documents")
    val m = pmod(col("doc_id"), lit(5))
    val derived = docs.select(
      // bounded below 1e6 so the inferred type of c0 is 'int' BY
      // CONSTRUCTION at any corpus size: inference samples rowsToScan rows
      // (the reference's knob — it cannot scan 100 TB), and an unbounded
      // doc_id would let the sampled rows say 'int' while the oracle's
      // full-table max says 'bigint' once ids cross 2^31. 1e6 ≡ 0 (mod 5),
      // so case_id below still equals doc_id % 5.
      pmod(col("doc_id"), lit(1000000)).cast("string").as("c0"),
      when(m === 0, (col("doc_id") * 3).cast("string"))       // long wins
        // bounded below 1e6: Spark renders doubles >= 1e7 in scientific
        // notation ("1.00000005E7"), which would diverge from the oracle's
        // decimal text at larger corpora — the bound keeps the rendering
        // plain-decimal at ANY scale
        .when(m === 1, concat(pmod(col("doc_id"), lit(1000000)).cast("string"),
          lit(".5"))) // double wins
        .when(m === 2, lit("yes"))                            // boolean literal wins
        .when(m === 3, lit("N/A"))                            // nullValues literal
        .otherwise(concat(lit("v"), col("doc_id").cast("string"))) // string fallback
        .as("c1"),
      when(pmod(col("doc_id"), lit(7)) === 3, lit("oops"))    // bad cell → WARN null
        .otherwise(pmod(col("doc_id"), lit(100)).cast("string")).as("c2"))
    Csv.write(derived, s"$dir/csv", Csv.CsvWriteOptions(header = false))
    val raw = Csv.read(spark, s"$dir/csv", Csv.CsvReadOptions(header = false))
    val lax = Coerce.CoerceOptions(strict = false)
    val inferred = InferSchema.infer(raw, rowsToScan = 1 << 20, opts = lax)
    val types = inferred.fields.map(_.dataType.simpleString)
    val target = StructType(Seq(
      StructField("doc_id_i", inferred.fields(0).dataType), // int, from inference
      StructField("union_raw", StringType),
      StructField("qual", IntegerType), // schema-directed; lax → bad cells null
      StructField("extra_missing", LongType))) // no 4th input cell → typed null
    val coerced = Coerce.framePositional(raw, target, lax)
      .withColumn("u", Coerce.cellUnion(col("union_raw"),
        Seq(LongType, DoubleType, BooleanType, StringType), lax))
    coerced
      .groupBy(pmod(col("doc_id_i"), lit(5)).cast("long").as("case_id"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(when(col("u").isNull, 1L).otherwise(0L)).as("union_nulls"),
        sum(coalesce(length(col("u")).cast("long"), lit(0L))).as("union_len"),
        sum(col("doc_id_i")).cast("long").as("sum_ids"),
        sum(col("qual")).cast("long").as("sum_qual"),
        sum(when(col("qual").isNull, 1L).otherwise(0L)).as("bad_cells"),
        sum(when(col("extra_missing").isNull, 1L).otherwise(0L)).as("extra_nulls"))
      .withColumn("t_c0", lit(types(0)))
      .withColumn("t_c1", lit(types(1)))
      .withColumn("t_c2", lit(types(2)))
  }

  def inferredSchema(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = Tables.scratchDir("graft-q-infer")
    // doc_id bounded below 1e6 (like q_coerce_union's c0): inference is a
    // SAMPLE while the oracle scans the full table, so the one scale-
    // dependent classification — int vs bigint at the 2^31 boundary — must
    // be impossible to flip. Every other column is shape-stable: n_chars
    // <= 64 KiB, text/lang/source are prose/fixed sets that classify
    // 'string' from any sample.
    val docs = load(spark, sfDir, "documents")
      .withColumn("doc_id", pmod(col("doc_id"), lit(1000000)))
    Csv.write(docs, s"$dir/csv", Csv.CsvWriteOptions(quoteMode = Csv.QuoteAlways))
    val raw = Csv.read(spark, s"$dir/csv", Csv.CsvReadOptions(nullValue = ""))
      .selectExpr(docs.columns.map(c => s"CAST($c AS STRING) AS $c"): _*)
    // scan bound far above any driver table size, so at driver scale the
    // sample IS the full table the oracle sees; past 2^20 rows the sample
    // contract (reference rowsToScan semantics) takes over, and the bounded
    // doc_id keeps every classification sample-invariant anyway
    InferSchema.infer(raw, rowsToScan = 1 << 20).fields.toSeq
      .map(f => (f.name, f.dataType.simpleString))
      .toDF("col_name", "inferred_type")
      .orderBy("col_name")
  }

  /** serde error taxonomy driven end-to-end (≙ reference
    * avro/AvroConverter.java:630-695 IllegalRow/IllegalCell + the 250-char
    * data-echo discipline at :619-627): each customer row is encoded with
    * the real protobuf wire encoders, a deterministic fault is injected by
    * c_custkey % 7 — residue 3 appends an undeclared field number (the
    * errorOnUnknownFields policy throws IllegalCellException naming it);
    * residue 5 appends a field-1 tag with a dangling varint continuation
    * byte (the wire reader throws mid-varint, wrapped as
    * IllegalRowException whose echo is trim250-bounded — the repeated name
    * is 360 chars, so the truncation branch is exercised on every bad row)
    * — and decoded through the descriptor-driven path. The aggregate pins
    * counts per kind, the exact exception-message char sums (trim250 echo
    * arithmetic recomputed by DuckDB), and the decoded key/name sums of the
    * surviving rows, so a drifting message format, a policy that stops
    * throwing, or a decoder that mis-reads healthy rows all fail the hash.
    *
    * Scale shape: one narrow mapPartitions over customer (descriptor parsed
    * once per partition, writer reused per row), no shuffle until the
    * 3-group aggregate.
    */
  def serdeErrors(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val descSet = Protobuf.buildFileDescriptorSet("graftq", "Cust",
      Seq(("c_custkey", 1, Descriptors.TInt64), ("c_name", 2, Descriptors.TString)))
    val per = load(spark, sfDir, "customer")
      .select(col("c_custkey").cast("long"), col("c_name"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val reg = Descriptors.parseFileDescriptorSet(descSet)
        val desc = Descriptors.find(reg, "graftq.Cust").get
        val w = new graft.codec.ByteWriter()
        it.map { case (key, name) =>
          w.clear()
          Protobuf.encodeVarintField(w, 1, key)
          Protobuf.encodeStringField(w, 2, name)
          key % 7 match {
            case 3 => Protobuf.encodeVarintField(w, 9, 1L) // undeclared field
            case 5 => w.writeByte((1 << 3) | 0); w.writeByte(0x80) // dangling varint
            case _ =>
          }
          try {
            val node = Protobuf.decodeWithDescriptor(
              w.result(), desc, reg, errorOnUnknownFields = true)
            ("ok", 0L, node.get("c_custkey").asLong(),
              node.get("c_name").asText().length.toLong)
          } catch {
            case e: SerdeErrors.IllegalCellException =>
              ("illegal_cell", e.getMessage.length.toLong, 0L, 0L)
            case scala.util.control.NonFatal(e) =>
              val wrapped = new SerdeErrors.IllegalRowException(name * 20, e)
              ("illegal_row", wrapped.getMessage.length.toLong, 0L, 0L)
          }
        }
      }
      .toDF("error_kind", "msg_len", "key", "name_len")
    per.groupBy("error_kind").agg(
        count(lit(1)).as("n"),
        sum(col("msg_len")).as("msg_chars"),
        sum(col("key")).as("key_sum"),
        sum(col("name_len")).as("name_chars"))
      .orderBy("error_kind")
  }
}
