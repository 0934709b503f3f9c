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

  test("date-only values coerce under the merged TimestampType") {
    // infer merges DateType ∪ TimestampType to TimestampType, so the
    // timestamp format must accept both shapes (date-only = midnight)
    val mixed = strDf(Seq("2024-01-01", "2024-01-01T10:00:00"))
    val out = mixed.select(Coerce.cell(col("c"), TimestampType).as("c")).collect()
    assert(!out(0).isNullAt(0) && !out(1).isNullAt(0))
    assert(out(0).getTimestamp(0).toString.startsWith("2024-01-01 00:00:00"))
  }

  test("lenient time targets null bad cells instead of throwing under ANSI") {
    val lax = Coerce.CoerceOptions(strict = false)
    val bad = strDf(Seq("2024-01-01", "not-a-date"))
    val dates = bad.select(Coerce.cell(col("c"), DateType, lax).as("c")).collect()
    assert(dates(0).getDate(0).toString == "2024-01-01" && dates(1).isNullAt(0))
    val tss = bad.select(Coerce.cell(col("c"), TimestampType, lax).as("c")).collect()
    assert(!tss(0).isNullAt(0) && tss(1).isNullAt(0))
    val ntzs = bad.select(Coerce.cell(col("c"), TimestampNTZType, lax).as("c")).collect()
    assert(!ntzs(0).isNullAt(0) && ntzs(1).isNullAt(0))
    // and strict still fails loudly (the ERROR contract)
    intercept[Exception] {
      bad.select(Coerce.cell(col("c"), DateType).as("c")).collect()
    }
    // union fall-through depends on the lax time path nulling, not throwing
    val u = Coerce.cellUnion(col("c"), Seq(DateType, StringType))
    val viaUnion = bad.select(u.as("c")).collect()
    assert(viaUnion(1).getString(0) == "not-a-date")
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
    // shapes the default timestampFormat can NOT parse must classify as
    // string — otherwise inference promises a type coercion then fails on
    assert(classify("2024-01-02 03:04:05", o) == StringType) // space separator
    assert(classify("2024-01-02T03:04:05+0530", o) == StringType) // no-colon offset
    assert(classify("2024-01-02T03:04:05.12", o) == StringType) // 2-digit fraction
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

  // ---- logical types ≙ avro/converter/Logical*Test + Complex{Enum,Fixed} --

  test("uuid: valid parses canonical, invalid nulls when lenient, errors strict") {
    val opts = Coerce.CoerceOptions(strict = false)
    val target = StructType(Seq(Coerce.uuidField("c")))
    val out = Coerce.frame(
      strDf(Seq("F8AA8870-9E13-4F07-ACF0-4D4DF6D0E6E5", "not-a-uuid", "NA")),
      target, opts).collect()
    assert(out(0).getString(0) == "f8aa8870-9e13-4f07-acf0-4d4df6d0e6e5")
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
    intercept[Exception] {
      Coerce.frame(strDf(Seq("nope")), target).collect()
    }
  }

  test("enum: closed symbol membership (reference ComplexEnumTest)") {
    val target = StructType(Seq(Coerce.enumField("c", Seq("a", "ž", "c"))))
    val ok = Coerce.frame(strDf(Seq("a", "ž")), target).collect()
    assert(ok.map(_.getString(0)).toSeq == Seq("a", "ž"))
    val lax = Coerce.frame(strDf(Seq("d")), target,
      Coerce.CoerceOptions(strict = false)).collect()
    assert(lax(0).isNullAt(0))
    intercept[Exception] {
      Coerce.frame(strDf(Seq("d")), target).collect()
    }
  }

  test("fixed(n): exact byte length enforced (reference ComplexFixedTest)") {
    val target = StructType(Seq(Coerce.fixedField("c", 4)))
    val ok = Coerce.frame(strDf(Seq("abcd")), target).collect()
    assert(ok(0).getAs[Array[Byte]](0).toSeq == "abcd".getBytes("UTF-8").toSeq)
    val lax = Coerce.frame(strDf(Seq("abcde")), target,
      Coerce.CoerceOptions(strict = false)).collect()
    assert(lax(0).isNullAt(0))
    intercept[Exception] {
      Coerce.frame(strDf(Seq("ab")), target).collect()
    }
    // a null-sentinel literal of exactly n bytes must normalize to NULL,
    // not be stored as the bytes of the sentinel ("null" is 4 bytes)
    val sentinel = Coerce.frame(strDf(Seq("null")), target).collect()
    assert(sentinel(0).isNullAt(0))
  }

  test("time-millis/micros: LocalTime semantics incl. offset drop (LogicalTimeTest)") {
    val lax = Coerce.CoerceOptions(strict = false)
    def millis(values: Seq[String]): Seq[Any] =
      Coerce.frame(strDf(values), StructType(Seq(Coerce.timeField("c", micros = false))), lax)
        .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
    // 12:13 → (12*3600+13*60)*1000; offsets are dropped like LocalTime.parse
    assert(millis(Seq("12:13")) == Seq(43980000L))
    assert(millis(Seq("12:13:11")) == Seq(43991000L))
    assert(millis(Seq("12:13:11.123000")) == Seq(43991123L))
    assert(millis(Seq("12:13:11+01:00")) == Seq(43991000L))
    assert(millis(Seq("12:26:2019")) == Seq(null)) // reference failedSource
    val micros = Coerce.frame(strDf(Seq("12:13:11.123000")),
      StructType(Seq(Coerce.timeField("c", micros = true))), lax).collect()
    assert(micros(0).getLong(0) == 43991123000L)
  }

  test("TimestampNTZ target (local-timestamp logical type)") {
    val target = StructType(Seq(StructField("c", TimestampNTZType)))
    val out = Coerce.frame(strDf(Seq("2024-03-05T10:15:30")), target).collect()
    assert(out(0).getAs[java.time.LocalDateTime](0) ==
      java.time.LocalDateTime.of(2024, 3, 5, 10, 15, 30))
  }

  test("union try-each: first successful target wins per value") {
    val c = Coerce.cellUnion(col("c"), Seq(IntegerType, DoubleType, StringType))
    val out = strDf(Seq("42", "3.5", "x", "NA")).select(c.as("c")).collect()
    // coalesce unifies to the widest member (string here)
    assert(out.map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq ==
      Seq("42", "3.5", "x", null))
  }

  // ---- nested coercion + inference ≙ AvroConverter :444-501 / InferAvroSchema :114-199

  test("nested struct/array/map coercion recurses to string leaves") {
    val src = spark.read.json(spark.createDataset(Seq(
      """{"rec":{"n":"1","tags":["2","3"],"kv":{"a":"4.5"}},"plain":"x"}""",
      """{"rec":{"n":"NA","tags":[],"kv":{}},"plain":"y"}"""
    ))(org.apache.spark.sql.Encoders.STRING))
    val target = StructType(Seq(
      StructField("rec", StructType(Seq(
        StructField("n", IntegerType),
        StructField("tags", ArrayType(LongType)),
        StructField("kv", MapType(StringType, DoubleType)),
        StructField("missing", StringType)))),
      StructField("plain", StringType)))
    val out = Coerce.frame(src, target).orderBy("plain").collect()
    val r0 = out(0).getStruct(out(0).fieldIndex("rec"))
    assert(r0.getInt(r0.fieldIndex("n")) == 1)
    assert(r0.getSeq[Long](r0.fieldIndex("tags")) == Seq(2L, 3L))
    assert(r0.getMap[String, Double](r0.fieldIndex("kv"))("a") == 4.5)
    assert(r0.isNullAt(r0.fieldIndex("missing")))
    val r1 = out(1).getStruct(out(1).fieldIndex("rec"))
    assert(r1.isNullAt(r1.fieldIndex("n"))) // "NA" nullified inside the struct
  }

  test("field-alias fallback: aliased CSV headers coerce under the schema name") {
    // ≙ reference getValueFromNameOrAliases (avro/AvroConverter.java:133-145):
    // a field absent under its own name is found under an alias; with BOTH a
    // name and an alias column present, values coalesce name-first per row
    val dir = java.nio.file.Files.createTempDirectory("graft-alias").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "a.csv"),
      "ident,user_name,score\n1,alice,3\n2,bob,4\nNA,carol,5\n")
    val raw = Csv.read(spark, s"$dir/a.csv")
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("score", IntegerType),
      StructField("city", StringType)))
    val out = Coerce.frame(raw, target,
      aliases = Map("id" -> Seq("ident"), "name" -> Seq("user_name"),
        "city" -> Seq("town"))).orderBy("name").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("alice", "bob", "carol"))
    assert(out(0).getLong(0) == 1L && out(1).getLong(0) == 2L)
    assert(out(2).isNullAt(0)) // "NA" nullified through the alias too
    assert(out.forall(_.isNullAt(3))) // no candidate column at all -> null
    // name + alias both present: per-row coalesce, name first
    import spark.implicits._
    val both = Seq((null.asInstanceOf[String], "fallback", "x"),
      ("primary", "shadowed", "y")).toDF("name", "user_name", "k")
    val merged = Coerce.frame(both,
      StructType(Seq(StructField("name", StringType), StructField("k", StringType))),
      aliases = Map("name" -> Seq("user_name"))).orderBy("k").collect()
    assert(merged.map(_.getString(0)).toSeq == Seq("fallback", "primary"))
  }

  test("nested inference: struct field-union merge, array element widening") {
    val src = spark.read.json(spark.createDataset(Seq(
      """{"rec":{"a":"1","b":"x"},"arr":["1","2"]}""",
      """{"rec":{"a":"2.5","c":"true"},"arr":["3000000000"]}"""
    ))(org.apache.spark.sql.Encoders.STRING))
    val schema = InferSchema.infer(src)
    val rec = schema("rec").dataType.asInstanceOf[StructType]
    assert(rec("a").dataType == DoubleType) // int ∪ double
    assert(rec("b").dataType == StringType)
    assert(rec("c").dataType == BooleanType) // present in one row only
    assert(schema("arr").dataType ==
      ArrayType(LongType, containsNull = true)) // int ∪ long
  }
}
