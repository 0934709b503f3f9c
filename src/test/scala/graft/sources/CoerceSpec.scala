package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Coercion-algebra tests mirroring the reference's per-primitive converter
  * suites (reference: avro/converter/PrimitiveIntTest.java etc. — good
  * values, null literals, true/false lists, strict vs lenient failures) and
  * the schema-inference merge tests (avro/infer/MergeAvroTypesTest.java).
  */
class CoerceSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("graft-coerce-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import org.apache.spark.sql.Row

  private def strDf(col1: Seq[String]): org.apache.spark.sql.DataFrame = {
    spark.sparkContext.setLogLevel("WARN")
    spark.createDataFrame(
      spark.sparkContext.parallelize(col1.map(Row(_))),
      StructType(Seq(StructField("c", StringType, nullable = true))))
  }

  test("null literals become NULL (reference nullValues list)") {
    val df = Coerce.frame(strDf(Seq("x", "", "NA", "null", "nan", "#N/A", "ok")),
      StructType(Seq(StructField("c", StringType))))
    assert(df.where(col("c").isNull).count() == 5)
    assert(df.where(col("c").isNotNull).count() == 2)
  }

  test("boolean true/false literal lists incl. 1/0") {
    val df = Coerce.frame(strDf(Seq("t", "true", "YES", "1", "f", "False", "no", "0")),
      StructType(Seq(StructField("c", BooleanType))))
    val vals = df.collect().map(_.getBoolean(0)).toSeq
    assert(vals == Seq(true, true, true, true, false, false, false, false))
  }

  test("numeric coercion incl. decimalSeparator swap and decimal(p,s)") {
    val opts = Coerce.CoerceOptions(decimalSeparator = ',')
    val d = Coerce.cell(col("c"), DoubleType, opts)
    val df = strDf(Seq("1,5", "-2,25")).select(d.as("c"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(1.5, -2.25))

    val dec = strDf(Seq("123.456")).select(
      Coerce.cell(col("c"), DecimalType(10, 2)).as("c"))
    assert(dec.first().getDecimal(0).toString == "123.46") // HALF_EVEN-ish rescale
  }

  test("date and timestamp formats") {
    val opts = Coerce.CoerceOptions(dateFormat = "yyyy/MM/dd")
    val df = strDf(Seq("2017/11/16")).select(Coerce.cell(col("c"), DateType, opts).as("c"))
    assert(df.first().getDate(0).toString == "2017-11-16")
    val ts = strDf(Seq("2017-02-07T11:23:39Z")).select(
      Coerce.cell(col("c"), TimestampType).as("c"))
    assert(ts.first().getTimestamp(0).toInstant.toString == "2017-02-07T11:23:39Z")
  }

  test("strict mode fails on a bad cell; lenient nulls it (onBadLines)") {
    val bad = strDf(Seq("12", "not-a-number"))
    val lenient = Coerce.frame(bad, StructType(Seq(StructField("c", IntegerType))),
      Coerce.CoerceOptions(strict = false))
    assert(lenient.collect().map(r => if (r.isNullAt(0)) null else r.getInt(0)).toSeq
      == Seq(12, null))
    val strictDf = Coerce.frame(bad, StructType(Seq(StructField("c", IntegerType))),
      Coerce.CoerceOptions(strict = true))
    intercept[Exception] { strictDf.collect() }
  }

  test("missing target columns come back as typed nulls (fromMap semantics)") {
    val df = Coerce.frame(strDf(Seq("1")), StructType(Seq(
      StructField("c", IntegerType), StructField("missing", StringType))))
    val r = df.first()
    assert(r.getInt(0) == 1 && r.isNullAt(1))
  }

  test("classify narrows correctly") {
    val o = Coerce.CoerceOptions()
    import InferSchema.classify
    assert(classify("42", o) == IntegerType)
    assert(classify("9999999999", o) == LongType)
    assert(classify("1.5", o) == DoubleType)
    assert(classify("1e3", o) == DoubleType)
    assert(classify("true", o) == BooleanType)
    assert(classify("2024-01-02", o) == DateType)
    assert(classify("2024-01-02T03:04:05Z", o) == TimestampType)
    assert(classify("hello", o) == StringType)
    assert(classify("NA", o) == NullType)
  }

  test("merge lattice widens like the reference union merge") {
    import InferSchema.merge
    assert(merge(IntegerType, LongType) == LongType)
    assert(merge(LongType, DoubleType) == DoubleType)
    assert(merge(DateType, TimestampType) == TimestampType)
    assert(merge(IntegerType, StringType) == StringType)
    assert(merge(NullType, IntegerType) == IntegerType)
    assert(merge(BooleanType, IntegerType) == StringType)
  }

  test("infer + coerce two-pass over a mixed sample") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("1", "3.5", "x", "2024-01-01", "true"),
        Row("2", "4", "y", "2024-06-07", "false"),
        Row("NA", "1e2", "z", "NA", "NA"))),
      StructType(Seq("a", "b", "c", "d", "e").map(StructField(_, StringType, true))))
    val schema = InferSchema.infer(df)
    assert(schema("a").dataType == IntegerType)
    assert(schema("b").dataType == DoubleType)
    assert(schema("c").dataType == StringType)
    assert(schema("d").dataType == DateType)
    assert(schema("e").dataType == BooleanType)
    val out = InferSchema.inferAndCoerce(df)
    assert(out.where(col("a").isNull).count() == 1)
    assert(out.schema == StructType(schema.fields.map(_.copy(nullable = true))))
  }
}
