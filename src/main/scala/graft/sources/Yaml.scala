package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-document YAML read/write (reference: yaml/YamlToIon.java:71-139 —
  * `---`-separated docs, one row per doc; yaml/IonToYaml.java:66-139 and the
  * JsonToYaml/YamlToJson transcodes). Parsing uses jackson-dataformat-yaml
  * (on the Spark classpath); rows pivot through JSON text into Spark's
  * native JSON reader, so schema inference and pushdown stay Catalyst-side.
  */
object Yaml {

  private def yamlMapper = {
    val f = new com.fasterxml.jackson.dataformat.yaml.YAMLFactory()
    new com.fasterxml.jackson.databind.ObjectMapper(f)
  }
  private def jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** one row per YAML document across all input files; non-UTF-8 charsets
    * read through binaryFile + explicit decode (wholetext text() is
    * UTF-8-only and would silently mojibake a Latin-1 input)
    */
  def read(spark: SparkSession, path: String, charset: String = "UTF-8"): DataFrame = {
    import spark.implicits._
    val whole: org.apache.spark.sql.Dataset[String] =
      if (charset.equalsIgnoreCase("UTF-8"))
        spark.read.option("wholetext", true).text(path).as[String]
      else {
        val cs = charset // serializable capture, validated on the driver
        java.nio.charset.Charset.forName(cs)
        spark.read.format("binaryFile").load(path)
          .select("content").as[Array[Byte]]
          .map(b => new String(b, cs))
      }
    val jsonDocs = whole
      .flatMap { whole =>
        val ym = yamlMapper
        val jm = jsonMapper
        val parser = ym.getFactory.createParser(whole)
        val it = ym.readValues(parser, classOf[com.fasterxml.jackson.databind.JsonNode])
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val node = it.next()
          if (node != null && !node.isNull) out += jm.writeValueAsString(node)
        }
        out
      }
    spark.read.json(jsonDocs)
  }

  /** n rows → `---`-separated YAML document stream (single file dir) */
  def write(df: DataFrame, path: String): Unit = {
    import df.sparkSession.implicits._
    val yamlDocs = df.toJSON.mapPartitions { it =>
      val ym = yamlMapper
      val jm = jsonMapper
      it.map { json =>
        // YAMLMapper emits a leading `---\n` per document by default
        ym.writeValueAsString(jm.readTree(json)).stripLineEnd
      }
    }
    yamlDocs.coalesce(1).write.mode("overwrite").text(path)
  }

  /** JSON(L) → YAML and YAML → JSONL transcodes ≙ yaml/JsonToYaml, YamlToJson */
  def jsonToYaml(spark: SparkSession, inPath: String, outPath: String,
      newLine: Boolean = true): Unit =
    write(Json.read(spark, inPath, newLine), outPath)

  def yamlToJsonl(spark: SparkSession, inPath: String, outPath: String): Unit =
    Json.writeJsonl(read(spark, inPath), outPath)
}
