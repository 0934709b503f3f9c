package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet read/write with the reference's writer knobs mapped 1:1 onto the
  * Hadoop parquet properties Spark forwards (reference:
  * parquet/IonToParquet.java:103-240 — compression UNCOMPRESSED/SNAPPY/
  * GZIP(default)/ZSTD, dictionary on/off, format V1/V2, row-group/page/
  * dictionary-page sizes; parquet/ParquetToIon.java:71-159 for the read).
  */
object Parquet {

  final case class ParquetWriteOptions(
      compressionCodec: String = "gzip", // reference default, IonToParquet.java:115
      dictionaryEncoding: Boolean = true,
      version: String = "v2", // PARQUET_2_0, IonToParquet.java:183
      rowGroupBytes: Long = 128L * 1024 * 1024,
      pageBytes: Int = 1024 * 1024,
      dictionaryPageBytes: Int = 1024 * 1024)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def write(df: DataFrame, path: String, opts: ParquetWriteOptions = ParquetWriteOptions()): Unit =
    df.write
      .option("compression", opts.compressionCodec)
      .option("parquet.enable.dictionary", opts.dictionaryEncoding)
      .option("parquet.writer.version", if (opts.version == "v2") "PARQUET_2_0" else "PARQUET_1_0")
      .option("parquet.block.size", opts.rowGroupBytes)
      .option("parquet.page.size", opts.pageBytes)
      .option("parquet.dictionary.page.size", opts.dictionaryPageBytes)
      .mode("overwrite")
      .parquet(path)
}
