package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JSON / JSONL read-write (reference: json/JsonToIon.java:91-190 — JSONL
  * line-by-line (`newLine=true`) or whole-file JSON array; json/IonToJson
  * .java:82-467 and json/JsonToJsonl.java:103-191 for the write paths).
  */
object Json {

  /** newLine=true → JSONL (one object per line); false → whole-file array */
  def read(spark: SparkSession, path: String, newLine: Boolean = true,
      charset: String = "UTF-8"): DataFrame =
    spark.read
      .option("multiLine", !newLine)
      .option("encoding", charset)
      .json(path)

  /** JSONL writer (one object per line — the reference's default ION→JSON).
    * `timeZoneId` renders timestamp columns in that zone (reference:
    * json/IonToJson.java:391-397 formats timestamps with a per-task
    * DateTimeFormatter zoned to the task's timeZoneId) — mapped to Spark's
    * native JSON writer `timeZone` option, which zones the JSON
    * timestampFormat exactly like the reference's formatter.
    */
  def writeJsonl(df: DataFrame, path: String,
      timeZoneId: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
    timeZoneId.fold(w)(tz => w.option("timeZone", tz)).json(path)
  }

  /** whole-file JSON array writer (reference: IonToJson newLine=false path,
    * json/IonToJson.java:239-267). One file; rows streamed, not collected.
    * `timeZoneId` as in writeJsonl (here via to_json's timeZone option —
    * toJSON takes no options).
    */
  def writeJsonArray(df: DataFrame, path: String,
      timeZoneId: Option[String] = None): Unit = {
    import df.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val rendered = timeZoneId match {
      case None => df.toJSON
      case Some(tz) => df.select(to_json(struct(df.columns.map(col)
        .toIndexedSeq: _*), Map("timeZone" -> tz))).as[String]
    }
    val json = rendered.coalesce(1).mapPartitions { it =>
      new Iterator[String] {
        private var started = false
        private var done = false
        def hasNext: Boolean = !done
        def next(): String = {
          if (!started) { started = true; "[" }
          else if (it.hasNext) {
            val row = it.next()
            if (it.hasNext) row + "," else row
          } else { done = true; "]" }
        }
      }
    }
    // emit rows with separators: [ obj, obj, ... ]
    json.write.mode("overwrite").text(path)
  }

  /** JSON array (or JSONL) → JSONL transcode ≙ json/JsonToJsonl.java */
  def jsonToJsonl(spark: SparkSession, inPath: String, outPath: String,
      newLine: Boolean = false): Unit =
    writeJsonl(read(spark, inPath, newLine), outPath)
}
