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

  /** DATA bytes only: Hadoop's local ChecksumFileSystem writes .crc
    * sidecars (~0.8% of data) and Spark adds _SUCCESS — counting them
    * would inflate the baseline and let a marginally-larger engine
    * "beat" it; the graft side of the comparison is pure payload bytes
    */
  def dirBytes(spark: org.apache.spark.sql.SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var total = 0L
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (!name.startsWith(".") && !name.startsWith("_")) total += st.getLen
    }
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
        try {
          val writer = new org.apache.avro.file.DataFileWriter(
            new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
          writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(
            java.util.zip.Deflater.DEFAULT_COMPRESSION))
          writer.create(schema, tmp)
          try {
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
          } finally writer.close()
          Iterator.single(tmp.length())
        } finally { tmp.delete(); () } // no corpus-sized leak on task failure
      }
    }(Encoders.scalaLong).groupBy().sum().first() match {
      case row if row.isNullAt(0) => 0L // zero-partition input
      case row => row.getLong(0)
    }
  }
}
