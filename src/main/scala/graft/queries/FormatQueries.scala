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
    val dir = java.nio.file.Files.createTempDirectory("graft-q-csv").toString
    val docs = load(spark, sfDir, "documents")
    Csv.write(docs, s"$dir/csv", Csv.CsvWriteOptions(quoteMode = Csv.QuoteAlways))
    val back = InferSchema.inferAndCoerce(
      Csv.read(spark, s"$dir/csv", Csv.CsvReadOptions(nullValue = "")),
      rowsToScan = 100)
    back.groupBy(col("lang"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("n_chars")).cast("long").as("total_chars"))
  }

  /** documents → JSONL → YAML stream → read → per-source counts */
  def yamlRoundtripAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-q-yaml").toString
    val docs = load(spark, sfDir, "documents")
    Json.writeJsonl(docs, s"$dir/jsonl")
    Yaml.jsonToYaml(spark, s"$dir/jsonl", s"$dir/yaml")
    Yaml.read(spark, s"$dir/yaml")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).cast("long").as("total_chars"))
  }

  /** documents → Avro(deflate, avro-java) → read → per-lang counts */
  def avroRoundtripAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft-q-avro").toString
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
    val dir = java.nio.file.Files.createTempDirectory("graft-q-excel").toString
    val docs = load(spark, sfDir, "documents")
    Excel.write(docs, s"$dir/xlsx", Excel.ExcelWriteOptions(sheetTitle = "documents"))
    Excel.read(spark, s"$dir/xlsx")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("n_chars"))).cast("long").as("total_chars"))
  }

  /** inferred schema of the CSV projection of documents (rows-only) */
  def inferredSchema(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q-infer").toString
    val docs = load(spark, sfDir, "documents")
    Csv.write(docs, s"$dir/csv", Csv.CsvWriteOptions(quoteMode = Csv.QuoteAlways))
    val raw = Csv.read(spark, s"$dir/csv", Csv.CsvReadOptions(nullValue = ""))
      .selectExpr(docs.columns.map(c => s"CAST($c AS STRING) AS $c"): _*)
    InferSchema.infer(raw).fields.toSeq
      .map(f => (f.name, f.dataType.simpleString))
      .toDF("col_name", "inferred_type")
      .orderBy("col_name")
  }
}
