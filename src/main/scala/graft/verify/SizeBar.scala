package graft.verify

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Compressed-size baselines per BASELINE.md: the engine's total encoded
  * bytes must be ≤ Parquet-snappy AND ≤ Avro-deflate of the same table.
  *
  * Parquet-snappy is written by Spark's own writer. No spark-avro jar ships
  * in /opt/spark/jars, so the Avro-deflate baseline is produced with the
  * Avro Java API (avro-1.12.1 on the classpath) — identical container
  * format and codec to `df.write.format("avro").option("compression",
  * "deflate")` — executed inside mapPartitions, one container file per
  * partition (sizes summed, files deleted).
  */
object SizeBar {

  def dirBytes(spark: org.apache.spark.sql.SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) total += it.next().getLen
    total
  }

  def parquetSnappyBytes(df: DataFrame, tmpDir: String): Long = {
    val path = s"$tmpDir/baseline-parquet-snappy"
    df.write.mode(SaveMode.Overwrite).option("compression", "snappy").parquet(path)
    dirBytes(df.sparkSession, path)
  }

  /** all-string schema Avro container files, deflate codec, one per partition */
  def avroDeflateBytes(df: DataFrame): Long = {
    import org.apache.spark.sql.Encoders
    val colNames = df.schema.fieldNames
    df.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.single(0L)
      else {
        val fields = new java.lang.StringBuilder()
        colNames.zipWithIndex.foreach { case (c, i) =>
          if (i > 0) fields.append(',')
          fields.append(s"""{"name":"$c","type":["null","string"]}""")
        }
        val schema = new org.apache.avro.Schema.Parser().parse(
          s"""{"type":"record","name":"r","fields":[$fields]}""")
        val tmp = java.io.File.createTempFile("graft-avro-bar", ".avro")
        val writer = new org.apache.avro.file.DataFileWriter(
          new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
        writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(
          java.util.zip.Deflater.DEFAULT_COMPRESSION))
        writer.create(schema, tmp)
        while (rows.hasNext) {
          val r = rows.next()
          val rec = new org.apache.avro.generic.GenericData.Record(schema)
          var c = 0
          while (c < colNames.length) {
            rec.put(c, if (r.isNullAt(c)) null else r.getString(c))
            c += 1
          }
          writer.append(rec)
        }
        writer.close()
        val n = tmp.length()
        tmp.delete()
        Iterator.single(n)
      }
    }(Encoders.scalaLong).reduce(_ + _)
  }
}
