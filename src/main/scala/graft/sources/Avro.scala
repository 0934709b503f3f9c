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

  /** read-side per-record policy ≙ reference avro/AvroToIon.java:160-169
    * (onBadLines on decode): ERROR fails the job, WARN logs + drops, SKIP
    * silently drops. Applies to undecodable records (corrupt blocks) and to
    * records failing the recursive schema validation.
    */
  sealed trait OnBadRecords
  case object ErrorOnBad extends OnBadRecords
  case object WarnOnBad extends OnBadRecords
  case object SkipOnBad extends OnBadRecords

  /** recursive null-in-non-nullable + type instance validation against the
    * container's own schema ≙ avro/AvroToIon.java:197-249 validateFieldType
    */
  private[sources] def validate(v: AnyRef, s: Schema): Option[String] = {
    import scala.jdk.CollectionConverters._
    s.getType match {
      case Schema.Type.UNION =>
        val branches = s.getTypes.asScala
        if (branches.exists(b => validate(v, b).isEmpty)) None
        else Some(s"value ${trim250(v)} matches no union branch of $s")
      case Schema.Type.NULL => if (v == null) None else Some(s"non-null ${trim250(v)} for null schema")
      case _ if v == null => Some(s"null value for non-nullable ${s.getType}")
      case Schema.Type.RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        s.getFields.asScala.iterator
          .flatMap(f => validate(rec.get(f.pos()), f.schema())
            .map(e => s"field ${f.name()}: $e"))
          .nextOption()
      case Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[AnyRef]].asScala.iterator
          .flatMap(e => validate(e, s.getElementType)).nextOption()
      case Schema.Type.MAP =>
        v.asInstanceOf[java.util.Map[AnyRef, AnyRef]].values().asScala.iterator
          .flatMap(e => validate(e, s.getValueType)).nextOption()
      case Schema.Type.STRING =>
        if (v.isInstanceOf[CharSequence]) None else Some(s"${trim250(v)} not a string")
      case Schema.Type.INT =>
        if (v.isInstanceOf[java.lang.Integer]) None else Some(s"${trim250(v)} not an int")
      case Schema.Type.LONG =>
        if (v.isInstanceOf[java.lang.Long]) None else Some(s"${trim250(v)} not a long")
      case Schema.Type.FLOAT =>
        if (v.isInstanceOf[java.lang.Float]) None else Some(s"${trim250(v)} not a float")
      case Schema.Type.DOUBLE =>
        if (v.isInstanceOf[java.lang.Double]) None else Some(s"${trim250(v)} not a double")
      case Schema.Type.BOOLEAN =>
        if (v.isInstanceOf[java.lang.Boolean]) None else Some(s"${trim250(v)} not a boolean")
      case Schema.Type.BYTES | Schema.Type.FIXED | Schema.Type.ENUM => None
      case _ => None
    }
  }

  private def trim250(v: AnyRef): String = SerdeErrors.trim250(v)

  /** one row per record across all container files under `path` */
  def read(spark: SparkSession, path: String,
      onBadLines: OnBadRecords = ErrorOnBad): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
    val jsonRows = bin.flatMap { bytes =>
      val in = new java.io.ByteArrayInputStream(bytes)
      val stream = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      val schema = stream.getSchema
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      def bad(msg: String): Unit = onBadLines match {
        case ErrorOnBad => throw new SerdeErrors.IllegalRowException(msg)
        case WarnOnBad => System.err.println(s"[graft] skipping bad avro record: $msg")
        case SkipOnBad =>
      }
      try {
        // a decode failure poisons the stream (bad block / sync marker):
        // apply the policy, then stop reading this file — the reference's
        // onErrorResume terminates its Flux the same way. hasNext itself
        // reads block headers, so it is inside the guard too.
        var corrupt = false
        while (!corrupt) {
          val rec: GenericRecord =
            try { if (stream.hasNext) stream.next() else { corrupt = true; null } }
            catch {
              case scala.util.control.NonFatal(e) =>
                corrupt = true
                bad(s"undecodable record: ${e.getClass.getSimpleName} ${e.getMessage}")
                null
            }
          if (rec != null) validate(rec, schema) match {
            case None => out += rec.toString // GenericRecord.toString is JSON
            case Some(err) => bad(err)
          }
        }
      } finally {
        try stream.close() catch { case scala.util.control.NonFatal(_) => }
      }
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
    SinkDirs.reset(df.sparkSession, path)
    df.foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          val schema = new Schema.Parser().parse(avroJson)
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val out = SinkDirs.create(path, f"part-$pid%05d.avro")
          val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
          codec match {
            case "deflate" => writer.setCodec(CodecFactory.deflateCodec(
              java.util.zip.Deflater.DEFAULT_COMPRESSION))
            case "snappy" => writer.setCodec(CodecFactory.snappyCodec())
            case "zstandard" => writer.setCodec(CodecFactory.zstandardCodec(3))
            case "null" | "none" => // uncompressed, the reference default
            case other => throw new IllegalArgumentException(s"unknown avro codec $other")
          }
          writer.create(schema, out)
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
