package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Schema inference over a bounded row sample with commutative type merging
  * — the Spark form of the reference's InferAvroSchema
  * (reference: avro/infer/InferAvroSchema.java:49-71 `take(N).map(inferField)
  * .reduce(mergeTypes)`; merge rules :201-271; every inferred leaf nullable
  * :149-176; default sample 100 rows, avro/AbstractAvroConverter.java:42-50).
  *
  * Works on all-string frames (CSV-style input). The lattice mirrors the
  * reference's union-widening: conflicting primitives widen toward string.
  */
object InferSchema {

  val DefaultRowsToScan = 100

  /** narrowest type that accepts the value */
  private[sources] def classify(s: String, opts: Coerce.CoerceOptions): DataType = {
    if (s == null || opts.nullValues.contains(s)) return NullType
    val t = s.trim
    // numeric wins over the boolean literal lists: "1"/"0" infer as ints
    // (boolean 1/0 is a schema-directed coercion, not an inference guess)
    if (t.matches("[+-]?\\d+")) {
      return try {
        val v = t.toLong
        if (v >= Int.MinValue && v <= Int.MaxValue) IntegerType else LongType
      } catch { case _: NumberFormatException => StringType /* > 64-bit */ }
    }
    if (t.matches("[+-]?(\\d+\\.\\d*|\\.\\d+)([eE][+-]?\\d+)?") ||
        t.matches("[+-]?\\d+[eE][+-]?\\d+")) return DoubleType
    if (opts.trueValues.contains(t.toLowerCase) || opts.falseValues.contains(t.toLowerCase))
      return BooleanType
    if (t.matches("\\d{4}-\\d{2}-\\d{2}")) return DateType
    // accept EXACTLY the shapes CoerceOptions.timestampFormat parses
    // ('T' separator, 3-digit fraction, colon offset or Z) — a looser
    // regex here would classify values the coercion pass then fails on
    // (inference says timestamp, ANSI to_timestamp throws on the value)
    if (t.matches("\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}(:\\d{2})?(\\.\\d{3})?(Z|[+-]\\d{2}:\\d{2})?"))
      return TimestampType
    StringType
  }

  /** merge ≙ InferAvroSchema.mergeTypes (:201-271): equal → same; numeric
    * widening int<long<double; struct/array/map merge recursively
    * (field-union, like the reference's record merge :243-271); anything
    * else → string (the union analog)
    */
  private[sources] def merge(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (NullType, x) => x
    case (x, NullType) => x
    case (IntegerType, LongType) | (LongType, IntegerType) => LongType
    case (IntegerType, DoubleType) | (DoubleType, IntegerType) => DoubleType
    case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
    case (DateType, TimestampType) | (TimestampType, DateType) => TimestampType
    case (x: StructType, y: StructType) =>
      val yf = y.fields.map(f => f.name -> f.dataType).toMap
      val merged = x.fields.map { f =>
        StructField(f.name, merge(f.dataType, yf.getOrElse(f.name, NullType)),
          nullable = true)
      } ++ y.fields.filterNot(f => x.fieldNames.contains(f.name))
        .map(f => StructField(f.name, f.dataType, nullable = true))
      StructType(merged)
    case (ArrayType(xe, _), ArrayType(ye, _)) =>
      ArrayType(merge(xe, ye), containsNull = true)
    case (MapType(_, xv, _), MapType(_, yv, _)) =>
      MapType(StringType, merge(xv, yv), valueContainsNull = true)
    case _ => StringType
  }

  /** recursive per-value inference for typed (JSON/XML/YAML-shaped) frames:
    * string leaves get the classify() refinement, nested values recurse
    * ≙ InferAvroSchema.inferField (:114-199)
    */
  private[sources] def inferValue(v: Any, opts: Coerce.CoerceOptions): DataType = v match {
    case null => NullType
    case s: String => classify(s, opts)
    case _: java.lang.Integer => IntegerType
    case _: java.lang.Long => LongType
    case _: java.lang.Double | _: java.lang.Float => DoubleType
    case _: java.lang.Boolean => BooleanType
    case _: java.math.BigDecimal => DoubleType
    case _: java.sql.Date | _: java.time.LocalDate => DateType
    case _: java.sql.Timestamp | _: java.time.Instant => TimestampType
    case _: Array[Byte] => BinaryType
    // NullType flows through nested inference so cross-row merges can still
    // refine (null-in-one-row ∪ bool-in-another = bool); nonNull() cleans
    // the final schema once at the top of infer()
    case r: org.apache.spark.sql.Row =>
      StructType(r.schema.fields.zipWithIndex.map { case (f, i) =>
        StructField(f.name,
          inferValue(if (r.isNullAt(i)) null else r.get(i), opts),
          nullable = true)
      })
    case seq: scala.collection.Seq[_] =>
      ArrayType(seq.iterator.map(inferValue(_, opts))
        .foldLeft(NullType: DataType)(merge), containsNull = true)
    case m: scala.collection.Map[_, _] =>
      MapType(StringType, m.valuesIterator.map(inferValue(_, opts))
        .foldLeft(NullType: DataType)(merge), valueContainsNull = true)
    case _ => StringType
  }

  /** NullType never escapes inference (all-null → string, like the ref) */
  private def nonNull(t: DataType): DataType = t match {
    case NullType => StringType
    case s: StructType =>
      StructType(s.fields.map(f => f.copy(dataType = nonNull(f.dataType))))
    case ArrayType(e, _) => ArrayType(nonNull(e), containsNull = true)
    case MapType(k, v, _) => MapType(k, nonNull(v), valueContainsNull = true)
    case other => other
  }

  /** infer a StructType for an all-string frame from the first N rows;
    * every field nullable (union(null, T) invariant)
    */
  def infer(df: DataFrame, rowsToScan: Int = DefaultRowsToScan,
      opts: Coerce.CoerceOptions = Coerce.CoerceOptions()): StructType = {
    val cols = df.columns
    val sample = df.limit(rowsToScan).collect()
    val merged = cols.zipWithIndex.map { case (c, i) =>
      val t = sample.iterator
        .map(r => inferValue(if (r.isNullAt(i)) null else r.get(i), opts))
        .foldLeft(NullType: DataType)(merge)
      StructField(c, nonNull(t), nullable = true)
    }
    StructType(merged)
  }

  /** infer + coerce in one step ≙ the IonToParquet two-pass lifecycle
    * (parquet/IonToParquet.java:155-204: inference pass, then encode pass)
    */
  def inferAndCoerce(df: DataFrame, rowsToScan: Int = DefaultRowsToScan,
      opts: Coerce.CoerceOptions = Coerce.CoerceOptions()): DataFrame =
    Coerce.frame(df, infer(df, rowsToScan, opts), opts)
}
