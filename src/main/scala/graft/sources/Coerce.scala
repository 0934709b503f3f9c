package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The per-cell type-coercion algebra as Catalyst expressions — the Spark
  * form of the reference's AvroConverter dispatch
  * (reference: avro/AvroConverter.java:219-284 `convert()`; null/true/false
  * literal lists :45-66; date/time/timestamp formats :68-93; per-field
  * onBadLines ERROR/WARN/SKIP :162-182 ≙ cast vs try-cast).
  */
object Coerce {

  /** the reference's default nullValues list (AvroConverter.java:51-66) */
  val NullValues: Seq[String] = Seq("", "#N/A", "#N/A N/A", "#NA", "-1.#IND",
    "-1.#QNAN", "-NaN", "-nan", "1.#IND", "1.#QNAN", "NA", "N/A", "NaN",
    "n/a", "nan", "null")
  val TrueValues: Seq[String] = Seq("t", "true", "yes", "1", "on") // :45-47
  val FalseValues: Seq[String] = Seq("f", "false", "no", "0", "off") // :48-49

  final case class CoerceOptions(
      nullValues: Seq[String] = NullValues,
      trueValues: Seq[String] = TrueValues,
      falseValues: Seq[String] = FalseValues,
      dateFormat: String = "yyyy-MM-dd", // :70
      // the whole time-of-day section is optional: inference merges
      // DateType ∪ TimestampType to TimestampType, so a column mixing
      // "2024-01-01" and "2024-01-01T10:00:00" must coerce BOTH shapes
      // (date-only parses as midnight) rather than crash on the dates
      timestampFormat: String = "yyyy-MM-dd['T'HH:mm[:ss][.SSS][XXX]]", // :78-93
      timeFormat: String = "HH:mm[:ss][.SSSSSS][.SSS]", // :72-76 timeFormatter
      decimalSeparator: Char = '.', // :286-292
      /** ERROR → plain cast (job fails on bad cell); SKIP/WARN → try-variant (null) */
      strict: Boolean = true)

  // ---- logical-type annotations (ride on StructField metadata, the same
  // way spark-avro records Avro logical types) --------------------------
  val LogicalKey = "graft.logical"
  val EnumSymbolsKey = "graft.enum.symbols"
  val FixedSizeKey = "graft.fixed.size"

  /** field carrying logicalType `uuid` (string, canonical lowercase) */
  def uuidField(name: String): StructField =
    StructField(name, StringType, nullable = true,
      new MetadataBuilder().putString(LogicalKey, "uuid").build())

  /** Avro `time-millis` (int millis-of-day) / `time-micros` (long micros) */
  def timeField(name: String, micros: Boolean): StructField =
    StructField(name, LongType, nullable = true,
      new MetadataBuilder()
        .putString(LogicalKey, if (micros) "time-micros" else "time-millis")
        .build())

  /** Avro enum: closed symbol set with membership check (:503-512) */
  def enumField(name: String, symbols: Seq[String]): StructField =
    StructField(name, StringType, nullable = true,
      new MetadataBuilder().putString(LogicalKey, "enum")
        .putStringArray(EnumSymbolsKey, symbols.toArray).build())

  /** Avro fixed(n): binary with exact length check (:471-483) */
  def fixedField(name: String, size: Int): StructField =
    StructField(name, BinaryType, nullable = true,
      new MetadataBuilder().putString(LogicalKey, "fixed")
        .putLong(FixedSizeKey, size.toLong).build())

  /** nullValues normalization: any listed literal becomes NULL (:514-522) */
  def nullified(c: Column, opts: CoerceOptions): Column =
    when(c.isin(opts.nullValues.map(lit): _*), lit(null)).otherwise(c)

  /** one string column → target type, reference semantics */
  def cell(c0: Column, target: DataType, opts: CoerceOptions = CoerceOptions()): Column = {
    val c = nullified(c0, opts)
    def castOr(col: Column, t: String): Column =
      if (opts.strict) col.cast(t) else try_cast(col, t)
    target match {
      case BooleanType =>
        when(lower(c).isin(opts.trueValues.map(lit): _*), lit(true))
          .when(lower(c).isin(opts.falseValues.map(lit): _*), lit(false))
          .otherwise(castOr(c, "boolean"))
      case IntegerType => castOr(c, "int")
      case LongType => castOr(c, "long")
      case FloatType | DoubleType =>
        val normalized =
          if (opts.decimalSeparator == '.') c
          else regexp_replace(c, java.util.regex.Pattern.quote(opts.decimalSeparator.toString), ".")
        castOr(normalized, if (target == FloatType) "float" else "double")
      case d: DecimalType => castOr(c, s"decimal(${d.precision},${d.scale})")
      // the time targets honor `strict` like every cast above: under ANSI
      // (Spark 4 default) plain to_date/to_timestamp THROW on a bad cell,
      // which is the ERROR contract — SKIP/WARN must null instead (this is
      // also what lets cellUnion fall through to a later member)
      case DateType =>
        if (opts.strict) to_date(c, opts.dateFormat)
        else try_to_timestamp(c, lit(opts.dateFormat)).cast("date")
      case TimestampType =>
        if (opts.strict) to_timestamp(c, opts.timestampFormat)
        else try_to_timestamp(c, lit(opts.timestampFormat))
      // Avro local-timestamp (no zone) ≙ AvroConverter.java:246-249.
      // No try_to_timestamp_ntz exists: probe validity with the tz variant
      // (same pattern), and only parse as NTZ where the probe succeeded —
      // CaseWhen evaluates the branch value lazily, so the ANSI-throwing
      // parse never runs on a bad cell
      case TimestampNTZType =>
        if (opts.strict) to_timestamp_ntz(c, lit(opts.timestampFormat))
        else when(try_to_timestamp(c, lit(opts.timestampFormat)).isNotNull,
          to_timestamp_ntz(c, lit(opts.timestampFormat)))
      case StringType => c
      case BinaryType => c.cast("binary")
      case other => throw new IllegalArgumentException(s"unsupported coercion target $other")
    }
  }

  /** a logical-typed field (see the *Field builders): validation + canonical
    * form, errors surfaced per `strict` exactly like the cast path
    */
  def logicalCell(c0: Column, field: StructField, opts: CoerceOptions): Column = {
    val c = nullified(c0.cast("string"), opts)
    def orFail(cond: Column, value: Column, what: String): Column = {
      val bad =
        if (opts.strict)
          raise_error(concat(lit(s"invalid $what value: "), coalesce(c, lit("null"))))
        else lit(null)
      when(c.isNull, lit(null)).when(cond, value).otherwise(bad)
    }
    field.metadata.getString(LogicalKey) match {
      case "uuid" => // ≙ logicalUuid (:321-327): parse-validate, canonical lc
        val re = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
        orFail(c.rlike(re), lower(c), "uuid")
      case "enum" => // ≙ complexEnum (:503-512): closed symbol membership
        val symbols = field.metadata.getStringArray(EnumSymbolsKey).toSeq
        orFail(c.isin(symbols.map(lit): _*), c, "enum")
      case "fixed" => // ≙ complexFixed (:471-483): exact byte length
        val n = field.metadata.getLong(FixedSizeKey)
        // from the NULLIFIED string, like every other logical type: a
        // null-sentinel literal whose byte length happens to equal n
        // ("null" into fixed(4)) must become NULL, not be stored as data
        val b = c.cast("binary")
        when(c.isNull, lit(null))
          .when(length(b) === n, b)
          .otherwise(if (opts.strict)
            raise_error(concat(lit(s"invalid fixed($n) length: "), length(b).cast("string")))
          else lit(null))
      case t @ ("time-millis" | "time-micros") =>
        // ≙ logicalTimeMillis/Micros (:354-376): LocalTime semantics — a
        // trailing zone offset is accepted and DROPPED (ISO_TIME parse).
        // Lax mode parses via try_to_timestamp (ANSI to_timestamp throws);
        // hour()/minute() extraction is session-tz-symmetric with the parse.
        val noZone = regexp_replace(c, "(Z|[+-]\\d{2}:?\\d{2})$", "")
        val full = concat(lit("1970-01-01 "), noZone)
        val fmt = "yyyy-MM-dd " + opts.timeFormat
        val ts = if (opts.strict) to_timestamp(full, fmt)
                 else try_to_timestamp(full, lit(fmt))
        val micros = hour(ts).cast("long") * 3600000000L +
          minute(ts).cast("long") * 60000000L +
          (date_part(lit("SECOND"), ts) * 1000000).cast("long")
        val v = if (t == "time-micros") micros else (micros / 1000).cast("long")
        orFail(ts.isNotNull, v, t)
      case other =>
        throw new IllegalArgumentException(s"unknown logical type $other")
    }
  }

  /** union try-each ≙ complexUnion (:444-456): first target that converts
    * wins per VALUE; the column's result type is the merge-lattice join of
    * the members (each attempt is explicitly cast there, so coalesce never
    * inserts its own possibly-failing implicit casts)
    */
  def cellUnion(c: Column, targets: Seq[DataType], opts: CoerceOptions = CoerceOptions()): Column = {
    val lax = opts.copy(strict = false)
    val unified = targets.reduceLeft(InferSchema.merge)
    val attempts = targets.map(t => cell(c, t, lax).cast(unified))
    coalesce(attempts: _*)
  }

  private def try_cast(c: Column, t: String): Column = c.try_cast(t)

  /** typed-source coercion: recurse through struct/array/map shapes (the
    * JSON/XML/YAML sources produce nested frames), apply the string algebra
    * at string leaves, plain-cast already-typed leaves.
    * ≙ AvroConverter complexArray/complexMap/fromMap recursion (:444-501).
    */
  def cellTyped(c: Column, src: DataType, target: DataType, opts: CoerceOptions): Column =
    (src, target) match {
      case (s: StructType, t: StructType) =>
        val present = s.fieldNames.toSet
        val rebuilt = struct(t.fields.map { f =>
          if (present(f.name))
            cellTyped(c.getField(f.name), s(f.name).dataType, f.dataType, opts).as(f.name)
          else lit(null).cast(f.dataType).as(f.name)
        }.toIndexedSeq: _*)
        when(c.isNull, lit(null).cast(t)).otherwise(rebuilt)
      case (ArrayType(se, _), ArrayType(te, _)) =>
        transform(c, x => cellTyped(x, se, te, opts))
      case (MapType(_, sv, _), MapType(_, tv, _)) =>
        map_from_arrays(
          map_keys(c).cast("array<string>"),
          transform(map_values(c), x => cellTyped(x, sv, tv, opts)))
      // JSON-style sources infer {"k": v} objects as structs; a MAP target
      // re-keys the struct fields (≙ complexMap :485-501)
      case (s: StructType, MapType(_, tv, _)) =>
        if (s.fields.isEmpty) lit(null).cast(MapType(StringType, tv))
        else {
          val keys = array(s.fieldNames.map(lit).toIndexedSeq: _*)
          val vals = array(s.fields.map(f =>
            cellTyped(c.getField(f.name), f.dataType, tv, opts)).toIndexedSeq: _*)
          when(c.isNull, lit(null).cast(MapType(StringType, tv)))
            .otherwise(map_from_arrays(keys, vals))
        }
      case (StringType, t) => cell(c, t, opts)
      case (_, t) =>
        if (opts.strict) c.cast(t) else c.try_cast(t.catalogString)
    }

  /** whole-frame coercion ≙ AvroConverter.fromMap (:147-195): field-by-field
    * convert with missing columns → null. Nested struct/array/map fields
    * recurse; logical-typed fields (metadata) go through logicalCell.
    *
    * `aliases` is the reference's name-or-aliases fallback
    * (avro/AvroConverter.java:133-145 getValueFromNameOrAliases): a target
    * field absent under its own name is looked up under each alias in
    * order. When several candidate columns exist, each is coerced to the
    * target type and the results are COALESCED in name-then-alias order —
    * the columnar form of the reference's per-record first-hit lookup
    * (type-sound even when alias columns carry different source types).
    * Per-row value coalesce — NOT schema-level column presence — is the
    * faithful translation: the reference falls through to aliases whenever
    * the name's VALUE is null (`value != null || aliases == null`,
    * AvroConverter.java:135-137), not only when the key is absent.
    */
  def frame(df: DataFrame, target: StructType,
      opts: CoerceOptions = CoerceOptions(),
      aliases: Map[String, Seq[String]] = Map.empty): DataFrame = {
    val src = df.schema
    val present = src.fieldNames.toSet
    def coerced(f: StructField, srcName: String): Column =
      if (f.metadata.contains(LogicalKey)) logicalCell(col(srcName), f, opts)
      else cellTyped(col(srcName), src(srcName).dataType, f.dataType, opts)
    df.select(target.fields.map { f =>
      val candidates = (f.name +: aliases.getOrElse(f.name, Nil)).filter(present)
      candidates match {
        case Seq() => lit(null).cast(f.dataType).as(f.name)
        case Seq(one) => coerced(f, one).as(f.name)
        case many => coalesce(many.map(coerced(f, _)): _*).as(f.name)
      }
    }.toIndexedSeq: _*)
  }

  /** positional coercion ≙ AvroConverter.fromArray (:197-216): schema
    * fields zip input columns by INDEX (headerless CSV `_c0.._cN` case);
    * missing trailing fields → typed nulls
    */
  def framePositional(df: DataFrame, target: StructType, opts: CoerceOptions = CoerceOptions()): DataFrame = {
    val in = df.columns
    df.select(target.fields.zipWithIndex.map { case (f, i) =>
      if (i < in.length) cell(col(in(i)), f.dataType, opts).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }
}
