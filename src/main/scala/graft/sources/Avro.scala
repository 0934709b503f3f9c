package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file read/write WITHOUT spark-avro (the jar does not ship
  * in /opt/spark/jars): the Avro Java library on the classpath does the
  * container codec work inside mapPartitions.
  *
  * Read ≙ reference avro/AvroToIon.java:72-449 (schema comes from the file,
  * rows validated by the reader); the GenericRecord→JSON→spark.read.json
  * pivot replaces the reference's GenericRecord→ION deserializer
  * (avro/AvroDeserializer.java:68-123) while keeping schema handling in
  * Catalyst. Write ≙ avro/IonToAvro.java:113-197 with a declared or derived
  * schema and a codec knob (reference default: no codec — IonToAvro.java:
  * 160-167; we default to deflate for the size bar).
  */
object Avro {

  /** one row per record across all container files under `path` */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
    val jsonRows = bin.flatMap { bytes =>
      val in = new java.io.ByteArrayInputStream(bytes)
      val stream = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (stream.hasNext) out += stream.next().toString // GenericRecord.toString is JSON
      stream.close()
      out
    }
    spark.read.json(jsonRows)
  }

  /** Spark schema → Avro schema: every field union(null, T), mirroring the
    * reference's inference invariant (avro/infer/InferAvroSchema.java:149-176)
    */
  def avroSchemaFor(schema: StructType, name: String = "row"): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case StringType => "\"string\""
        case IntegerType => "\"int\""
        case LongType => "\"long\""
        case FloatType => "\"float\""
        case DoubleType => "\"double\""
        case BooleanType => "\"boolean\""
        case BinaryType => "\"bytes\""
        case TimestampType => "{\"type\":\"long\",\"logicalType\":\"timestamp-micros\"}"
        case DateType => "{\"type\":\"int\",\"logicalType\":\"date\"}"
        case other => throw new IllegalArgumentException(s"unsupported avro field type $other")
      }
      s"""{"name":"${f.name}","type":["null",$base],"default":null}"""
    }
    new Schema.Parser().parse(
      s"""{"type":"record","name":"$name","fields":[${fields.mkString(",")}]}""")
  }

  /** container files (one per partition) with the given codec */
  def write(df: DataFrame, path: String, codec: String = "deflate"): Unit = {
    val sparkSchema = df.schema
    val avroJson = avroSchemaFor(sparkSchema).toString
    val fields = sparkSchema.fields
    new java.io.File(path).mkdirs()
    df.foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          val schema = new Schema.Parser().parse(avroJson)
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val file = new java.io.File(path, f"part-$pid%05d.avro")
          val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
          codec match {
            case "deflate" => writer.setCodec(CodecFactory.deflateCodec(
              java.util.zip.Deflater.DEFAULT_COMPRESSION))
            case "snappy" => writer.setCodec(CodecFactory.snappyCodec())
            case "zstandard" => writer.setCodec(CodecFactory.zstandardCodec(3))
            case "null" | "none" => // uncompressed, the reference default
            case other => throw new IllegalArgumentException(s"unknown avro codec $other")
          }
          writer.create(schema, file)
          while (rows.hasNext) {
            val r = rows.next()
            val rec = new org.apache.avro.generic.GenericData.Record(schema)
            var i = 0
            while (i < fields.length) {
              val v: AnyRef =
                if (r.isNullAt(i)) null
                else fields(i).dataType match {
                  case TimestampType =>
                    java.lang.Long.valueOf(
                      r.getTimestamp(i).toInstant.toEpochMilli * 1000L +
                        (r.getTimestamp(i).getNanos / 1000) % 1000)
                  case DateType =>
                    java.lang.Integer.valueOf(r.getDate(i).toLocalDate.toEpochDay.toInt)
                  case BinaryType => java.nio.ByteBuffer.wrap(r.getAs[Array[Byte]](i))
                  case _ => r.get(i).asInstanceOf[AnyRef]
                }
              rec.put(i, v)
              i += 1
            }
            writer.append(rec)
          }
          writer.close()
        }
    }
  }
}
