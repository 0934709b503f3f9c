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
      timestampFormat: String = "yyyy-MM-dd'T'HH:mm[:ss][.SSS][XXX]", // :78-93
      decimalSeparator: Char = '.', // :286-292
      /** ERROR → plain cast (job fails on bad cell); SKIP/WARN → try-variant (null) */
      strict: Boolean = true)

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
      case DateType => to_date(c, opts.dateFormat)
      case TimestampType => to_timestamp(c, opts.timestampFormat)
      case StringType => c
      case BinaryType => c.cast("binary")
      case other => throw new IllegalArgumentException(s"unsupported coercion target $other")
    }
  }

  private def try_cast(c: Column, t: String): Column = c.try_cast(t)

  /** whole-frame coercion ≙ AvroConverter.fromMap (:147-195): field-by-field
    * convert with missing columns → null (the reference's alias fallback
    * reduces to column lookup here)
    */
  def frame(df: DataFrame, target: StructType, opts: CoerceOptions = CoerceOptions()): DataFrame = {
    val present = df.columns.toSet
    df.select(target.fields.map { f =>
      if (present(f.name)) cell(col(f.name), f.dataType, opts).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
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
