package graft.sources

import graft.codec.ByteReader
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Protobuf wire-format decode (reference: protobuf/ProtobufToIon.java:
  * 84-225 — DynamicMessage decode of single or length-delimited streams).
  *
  * No protobuf-java ships on this classpath (only shaded copies inside the
  * ORC jars), so this decodes the WIRE FORMAT directly: field numbers +
  * wire types per the public protobuf encoding spec. Without a descriptor
  * set, fields are named `f<number>`; length-delimited payloads are decoded
  * as nested messages when they parse cleanly, as UTF-8 strings when valid
  * text, else base64 bytes — the descriptor-driven naming/typing of the
  * reference plugs in here if protobuf-java is added (one resolver seam).
  */
object Protobuf {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** decode one message's bytes into a field-number-keyed JsonNode */
  def decodeMessage(bytes: Array[Byte]): com.fasterxml.jackson.databind.JsonNode = {
    val obj = mapper.createObjectNode()
    val r = new ByteReader(bytes)
    while (r.hasRemaining) {
      val tag = r.readVarLong()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      require(field > 0, s"invalid field number $field")
      val key = s"f$field"
      wire match {
        case 0 => put(obj, key, mapper.getNodeFactory.numberNode(r.readVarLong()))
        case 1 => // fixed64
          var v = 0L
          for (k <- 0 until 8) v |= (r.readByte().toLong & 0xff) << (8 * k)
          put(obj, key, mapper.getNodeFactory.numberNode(v))
        case 2 =>
          val n = r.readVarInt()
          val payload = r.readBytes(n)
          put(obj, key, decodeLengthDelimited(payload))
        case 5 => // fixed32
          var v = 0
          for (k <- 0 until 4) v |= (r.readByte() & 0xff) << (8 * k)
          put(obj, key, mapper.getNodeFactory.numberNode(v))
        case other => throw new IllegalArgumentException(s"unsupported wire type $other")
      }
    }
    obj
  }

  /** repeated fields accumulate into arrays */
  private def put(obj: com.fasterxml.jackson.databind.node.ObjectNode, key: String,
      v: com.fasterxml.jackson.databind.JsonNode): Unit = {
    if (!obj.has(key)) { obj.set[com.fasterxml.jackson.databind.JsonNode](key, v); () }
    else obj.get(key) match {
      case arr: com.fasterxml.jackson.databind.node.ArrayNode => arr.add(v); ()
      case prev =>
        val arr = mapper.createArrayNode()
        arr.add(prev); arr.add(v)
        obj.set[com.fasterxml.jackson.databind.JsonNode](key, arr)
        ()
    }
  }

  private def decodeLengthDelimited(payload: Array[Byte]): com.fasterxml.jackson.databind.JsonNode = {
    // nested message if it parses cleanly and is non-trivial
    if (payload.nonEmpty) {
      try {
        val nested = decodeMessage(payload)
        if (nested.size() > 0) return nested
      } catch { case _: Throwable => }
    }
    if (isValidUtf8Text(payload))
      mapper.getNodeFactory.textNode(new String(payload, java.nio.charset.StandardCharsets.UTF_8))
    else
      mapper.getNodeFactory.textNode(java.util.Base64.getEncoder.encodeToString(payload))
  }

  private def isValidUtf8Text(b: Array[Byte]): Boolean = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
    try {
      val s = dec.decode(java.nio.ByteBuffer.wrap(b)).toString
      s.forall(c => !Character.isISOControl(c) || c == '\n' || c == '\t' || c == '\r')
    } catch { case _: Throwable => false }
  }

  /** length-delimited message stream (varint size prefix per message,
    * `delimited=true` in the reference) → one row per message
    */
  def readDelimited(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val json = spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        val r = new ByteReader(bytes)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        while (r.hasRemaining) {
          val n = r.readVarInt()
          out += mapper.writeValueAsString(decodeMessage(r.readBytes(n)))
        }
        out
      }
    spark.read.json(json)
  }

  /** one message per file (`delimited=false`) */
  def readSingle(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val json = spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .map(bytes => mapper.writeValueAsString(decodeMessage(bytes)))
    spark.read.json(json)
  }

  // ---- descriptor-driven decode (≙ protobuf/ProtobufTools.java:13-93) ----
  //
  // A compiled FileDescriptorSet is ITSELF a protobuf message (public
  // descriptor.proto), so the wire decoder above bootstraps it — no
  // protobuf-java needed. Resolved descriptors give fields their real
  // names and types instead of f<number> guesses.

  /** decode one message with a resolved descriptor: real field names,
    * typed leaves (zigzag sints, enum symbol names, packed repeateds,
    * float/double fixed decodes), nested messages by type_name.
    */
  def decodeWithDescriptor(
      bytes: Array[Byte],
      desc: Descriptors.MessageD,
      reg: Descriptors.Registry,
      errorOnUnknownFields: Boolean = false): com.fasterxml.jackson.databind.JsonNode = {
    val nf = mapper.getNodeFactory
    val obj = mapper.createObjectNode()
    val byNum = desc.fields.map(f => f.number -> f).toMap
    val r = new ByteReader(bytes)
    while (r.hasRemaining) {
      val tag = r.readVarLong()
      val num = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      val fd = byNum.get(num)
      // unknown-field policy ≙ protobuf/ProtobufToIon.java:196-200
      // (errorOnUnknownFields): fail on a field number the descriptor does
      // not declare, else keep it under a f<number> key
      if (fd.isEmpty && errorOnUnknownFields)
        throw new SerdeErrors.IllegalCellException(
          s"f$num", s"unknown field number $num in message ${desc.fullName}")
      val key = fd.map(_.name).getOrElse(s"f$num")
      def putV(v: com.fasterxml.jackson.databind.JsonNode): Unit =
        if (fd.exists(_.repeated)) {
          val arr = obj.get(key) match {
            case a: com.fasterxml.jackson.databind.node.ArrayNode => a
            case _ =>
              val a = mapper.createArrayNode()
              obj.set[com.fasterxml.jackson.databind.JsonNode](key, a)
              a
          }
          arr.add(v); ()
        } else { obj.set[com.fasterxml.jackson.databind.JsonNode](key, v); () }
      def varintNode(v: Long): com.fasterxml.jackson.databind.JsonNode =
        fd.map(_.tpe) match {
          case Some(Descriptors.TBool) => nf.booleanNode(v != 0)
          case Some(Descriptors.TSint32) => nf.numberNode((v >>> 1).toInt ^ -(v & 1).toInt)
          case Some(Descriptors.TSint64) => nf.numberNode((v >>> 1) ^ -(v & 1))
          case Some(Descriptors.TEnum) =>
            fd.flatMap(f => reg.enums.get(Descriptors.strip(f.typeName)))
              .flatMap(_.values.get(v.toInt))
              .map(nf.textNode).getOrElse(nf.numberNode(v))
          case Some(Descriptors.TInt32) => nf.numberNode(v.toInt)
          // unsigned types must not surface the sign bit as a negative:
          // uint32 0xFFFFFFFF is 4294967295, not -1 (DynamicMessage prints
          // these unsigned); uint64 past Long.MaxValue widens to BigInteger
          case Some(Descriptors.TUint32) => nf.numberNode(v & 0xFFFFFFFFL)
          case Some(Descriptors.TUint64) =>
            if (v >= 0) nf.numberNode(v)
            else nf.numberNode(new java.math.BigInteger(
              java.lang.Long.toUnsignedString(v)))
          case _ => nf.numberNode(v)
        }
      wire match {
        case 0 => putV(varintNode(r.readVarLong()))
        case 1 =>
          var v = 0L
          for (k <- 0 until 8) v |= (r.readByte().toLong & 0xff) << (8 * k)
          putV(if (fd.exists(_.tpe == Descriptors.TDouble))
            nf.numberNode(java.lang.Double.longBitsToDouble(v))
          else if (fd.exists(_.tpe == Descriptors.TFixed64) && v < 0)
            nf.numberNode(new java.math.BigInteger(
              java.lang.Long.toUnsignedString(v))) // fixed64 is unsigned
          else nf.numberNode(v))
        case 5 =>
          var v = 0
          for (k <- 0 until 4) v |= (r.readByte() & 0xff) << (8 * k)
          putV(if (fd.exists(_.tpe == Descriptors.TFloat))
            nf.numberNode(java.lang.Float.intBitsToFloat(v))
          else if (fd.exists(_.tpe == Descriptors.TFixed32))
            nf.numberNode(v.toLong & 0xFFFFFFFFL) // fixed32 is unsigned
          else nf.numberNode(v))
        case 2 =>
          val payload = r.readBytes(r.readVarInt())
          fd match {
            case Some(f) if f.tpe == Descriptors.TMessage =>
              reg.messages.get(Descriptors.strip(f.typeName)) match {
                case Some(nested) =>
                  putV(decodeWithDescriptor(payload, nested, reg, errorOnUnknownFields))
                case None => putV(decodeLengthDelimited(payload))
              }
            case Some(f) if f.tpe == Descriptors.TString =>
              putV(nf.textNode(new String(payload, java.nio.charset.StandardCharsets.UTF_8)))
            case Some(f) if f.tpe == Descriptors.TBytes =>
              putV(nf.textNode(java.util.Base64.getEncoder.encodeToString(payload)))
            case Some(f) if f.repeated && Descriptors.packable(f.tpe) =>
              // packed repeated scalars: the whole payload is a value run
              val pr = new ByteReader(payload)
              // fixed-width packed types are 4/8-byte little-endian records,
              // NOT varints — reading them as varints misaligns the stream
              while (pr.hasRemaining) f.tpe match {
                case Descriptors.TFloat =>
                  var v = 0
                  for (k <- 0 until 4) v |= (pr.readByte() & 0xff) << (8 * k)
                  putV(nf.numberNode(java.lang.Float.intBitsToFloat(v)))
                case Descriptors.TDouble =>
                  var v = 0L
                  for (k <- 0 until 8) v |= (pr.readByte().toLong & 0xff) << (8 * k)
                  putV(nf.numberNode(java.lang.Double.longBitsToDouble(v)))
                case Descriptors.TFixed32 | Descriptors.TSfixed32 =>
                  var v = 0
                  for (k <- 0 until 4) v |= (pr.readByte() & 0xff) << (8 * k)
                  putV(if (f.tpe == Descriptors.TFixed32)
                    nf.numberNode(v.toLong & 0xFFFFFFFFL) // unsigned
                  else nf.numberNode(v))
                case Descriptors.TFixed64 | Descriptors.TSfixed64 =>
                  var v = 0L
                  for (k <- 0 until 8) v |= (pr.readByte().toLong & 0xff) << (8 * k)
                  putV(if (f.tpe == Descriptors.TFixed64 && v < 0)
                    nf.numberNode(new java.math.BigInteger(
                      java.lang.Long.toUnsignedString(v))) // unsigned
                  else nf.numberNode(v))
                case _ => putV(varintNode(pr.readVarLong()))
              }
            case _ => putV(decodeLengthDelimited(payload))
          }
        case other => throw new IllegalArgumentException(s"unsupported wire type $other")
      }
    }
    obj
  }

  /** descriptor-resolved length-delimited stream → one named-column row
    * per message (≙ ProtobufToIon with descriptorSet + typeName)
    */
  def readDelimitedWithDescriptor(
      spark: SparkSession, path: String,
      descriptorSet: Array[Byte], typeName: String,
      errorOnUnknownFields: Boolean = false): DataFrame = {
    import spark.implicits._
    val reg = Descriptors.parseFileDescriptorSet(descriptorSet)
    val desc = Descriptors.find(reg, typeName).getOrElse(
      throw new IllegalArgumentException(s"message type $typeName not in descriptor set"))
    val json = spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        val r = new ByteReader(bytes)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        while (r.hasRemaining) {
          val n = r.readVarInt()
          out += mapper.writeValueAsString(
            decodeWithDescriptor(r.readBytes(n), desc, reg, errorOnUnknownFields))
        }
        out
      }
    spark.read.json(json)
  }

  /** distributed length-delimited export (the inverse of readDelimited):
    * one binary file per partition (same shape as Excel.write's
    * one-workbook-per-partition), each row encoded as a varint-size-prefixed
    * message. Field numbers are column positions + 1; long/int columns →
    * int64 varints, everything else → string. Pairs with
    * `buildFileDescriptorSet(schemaDescriptorFields(df.schema))` for a
    * named-column descriptor-driven read-back.
    */
  def writeDelimited(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    SinkDirs.reset(df.sparkSession, path)
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val out = new java.io.BufferedOutputStream(
          SinkDirs.create(path, f"part-$pid%05d.bin"))
        val w = new graft.codec.ByteWriter()
        val lenW = new graft.codec.ByteWriter()
        try rows.foreach { row =>
          w.clear()
          var i = 0
          while (i < schema.fields.length) {
            if (!row.isNullAt(i)) schema.fields(i).dataType match {
              case org.apache.spark.sql.types.LongType =>
                encodeVarintField(w, i + 1, row.getLong(i))
              case org.apache.spark.sql.types.IntegerType =>
                encodeVarintField(w, i + 1, row.getInt(i).toLong)
              case org.apache.spark.sql.types.StringType =>
                encodeStringField(w, i + 1, row.getString(i))
              case _ =>
                encodeStringField(w, i + 1, String.valueOf(row.get(i)))
            }
            i += 1
          }
          val msg = w.result()
          lenW.clear()
          lenW.writeVarInt(msg.length)
          out.write(lenW.result())
          out.write(msg)
        } finally out.close()
      }
      ()
    }
  }

  /** descriptor-set fields for a flat Spark schema: (name, number, type)
    * with int64 for integral columns and string otherwise — the projection
    * writeDelimited encodes
    */
  def schemaDescriptorFields(schema: org.apache.spark.sql.types.StructType)
      : Seq[(String, Int, Int)] =
    schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      val t = f.dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType => Descriptors.TInt64
        case _ => Descriptors.TString
      }
      (f.name, i + 1, t)
    }

  /** assemble a compiled FileDescriptorSet (the wire form protoc emits) for
    * one flat message — built with the same minimal encoder, per the public
    * descriptor.proto field numbers documented on `Descriptors`
    */
  def buildFileDescriptorSet(pkg: String, message: String,
      fields: Seq[(String, Int, Int)]): Array[Byte] = {
    val m = new graft.codec.ByteWriter()
    encodeStringField(m, 1, message)
    fields.foreach { case (n, num, t) =>
      val fw = new graft.codec.ByteWriter()
      encodeStringField(fw, 1, n)
      encodeVarintField(fw, 3, num.toLong)
      encodeVarintField(fw, 4, 1L) // LABEL_OPTIONAL
      encodeVarintField(fw, 5, t.toLong)
      encodeMessageField(m, 2, fw.result())
    }
    val file = new graft.codec.ByteWriter()
    encodeStringField(file, 1, s"$pkg.proto")
    encodeStringField(file, 2, pkg)
    encodeMessageField(file, 4, m.result())
    val set = new graft.codec.ByteWriter()
    encodeMessageField(set, 1, file.result())
    set.result()
  }

  // ---- minimal encoder (for tests / round-trips) ----
  def encodeVarintField(w: graft.codec.ByteWriter, field: Int, v: Long): Unit = {
    w.writeVarLong((field.toLong << 3) | 0)
    w.writeVarLong(v)
  }

  def encodeStringField(w: graft.codec.ByteWriter, field: Int, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    w.writeVarLong((field.toLong << 3) | 2)
    w.writeVarInt(b.length)
    w.writeBytes(b)
  }

  def encodeMessageField(w: graft.codec.ByteWriter, field: Int, m: Array[Byte]): Unit = {
    w.writeVarLong((field.toLong << 3) | 2)
    w.writeVarInt(m.length)
    w.writeBytes(m)
  }
}

/** Minimal FileDescriptorSet model parsed straight off the wire via the
  * public descriptor.proto field numbers (≙ ProtobufTools.java:13-93,
  * which does the same via protobuf-java):
  * FileDescriptorSet.file=1; FileDescriptorProto{name=1, package=2,
  * message_type=4, enum_type=5}; DescriptorProto{name=1, field=2,
  * nested_type=3, enum_type=4}; FieldDescriptorProto{name=1, number=3,
  * label=4, type=5, type_name=6}; EnumDescriptorProto{name=1, value=2};
  * EnumValueDescriptorProto{name=1, number=2}.
  */
object Descriptors {
  import graft.codec.ByteReader

  // FieldDescriptorProto.Type values (public enum)
  val TDouble = 1; val TFloat = 2; val TInt64 = 3; val TUint64 = 4
  val TInt32 = 5; val TFixed64 = 6; val TFixed32 = 7; val TBool = 8
  val TString = 9; val TMessage = 11; val TBytes = 12; val TUint32 = 13
  val TEnum = 14; val TSfixed32 = 15; val TSfixed64 = 16
  val TSint32 = 17; val TSint64 = 18

  def packable(t: Int): Boolean =
    t != TString && t != TBytes && t != TMessage && t != 10

  final case class FieldD(name: String, number: Int, repeated: Boolean,
      tpe: Int, typeName: String)
  final case class MessageD(fullName: String, fields: Seq[FieldD])
  final case class EnumD(fullName: String, values: Map[Int, String])
  final case class Registry(messages: Map[String, MessageD], enums: Map[String, EnumD])

  def strip(typeName: String): String =
    if (typeName.startsWith(".")) typeName.drop(1) else typeName

  /** exact full-name lookup, leading dot normalized (≙ findMessageDescriptor) */
  def find(reg: Registry, typeName: String): Option[MessageD] =
    reg.messages.get(strip(typeName))

  /** generic field walk of one wire message */
  private def walk(bytes: Array[Byte])(f: (Int, Int, Long, Array[Byte]) => Unit): Unit = {
    val r = new ByteReader(bytes)
    while (r.hasRemaining) {
      val tag = r.readVarLong()
      val num = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      wire match {
        case 0 => f(num, 0, r.readVarLong(), null)
        case 1 => r.skip(8); f(num, 1, 0L, null)
        case 5 => r.skip(4); f(num, 5, 0L, null)
        case 2 => f(num, 2, 0L, r.readBytes(r.readVarInt()))
        case other => throw new IllegalArgumentException(s"wire $other in descriptor")
      }
    }
  }

  private def str(b: Array[Byte]): String =
    new String(b, java.nio.charset.StandardCharsets.UTF_8)

  def parseFileDescriptorSet(bytes: Array[Byte]): Registry = {
    val messages = Map.newBuilder[String, MessageD]
    val enums = Map.newBuilder[String, EnumD]

    def parseEnum(b: Array[Byte], scope: String): Unit = {
      var name = ""
      val values = Map.newBuilder[Int, String]
      walk(b) { (num, _, _, payload) =>
        num match {
          case 1 => name = str(payload)
          case 2 => // EnumValueDescriptorProto
            var vName = ""
            var vNum = 0
            walk(payload) { (n2, w2, v2, p2) =>
              n2 match {
                case 1 if w2 == 2 => vName = str(p2)
                case 2 if w2 == 0 => vNum = v2.toInt
                case _ =>
              }
            }
            values += (vNum -> vName)
          case _ =>
        }
      }
      enums += (s"$scope$name" -> EnumD(s"$scope$name", values.result()))
    }

    def parseMessage(b: Array[Byte], scope: String): Unit = {
      var name = ""
      val fields = Seq.newBuilder[FieldD]
      val nestedMsgs = Seq.newBuilder[Array[Byte]]
      val nestedEnums = Seq.newBuilder[Array[Byte]]
      walk(b) { (num, _, _, payload) =>
        num match {
          case 1 => name = str(payload)
          case 2 => // FieldDescriptorProto
            var fName = ""
            var fNum = 0
            var label = 1
            var tpe = 0
            var typeName = ""
            walk(payload) { (n2, w2, v2, p2) =>
              n2 match {
                case 1 if w2 == 2 => fName = str(p2)
                case 3 if w2 == 0 => fNum = v2.toInt
                case 4 if w2 == 0 => label = v2.toInt
                case 5 if w2 == 0 => tpe = v2.toInt
                case 6 if w2 == 2 => typeName = str(p2)
                case _ =>
              }
            }
            fields += FieldD(fName, fNum, repeated = label == 3, tpe, typeName)
          case 3 => nestedMsgs += payload
          case 4 => nestedEnums += payload
          case _ =>
        }
      }
      val full = s"$scope$name"
      messages += (full -> MessageD(full, fields.result()))
      nestedMsgs.result().foreach(parseMessage(_, s"$full."))
      nestedEnums.result().foreach(parseEnum(_, s"$full."))
    }

    walk(bytes) { (num, wire, _, payload) =>
      if (num == 1 && wire == 2) { // FileDescriptorProto
        var pkg = ""
        val msgs = Seq.newBuilder[Array[Byte]]
        val ens = Seq.newBuilder[Array[Byte]]
        walk(payload) { (n2, w2, _, p2) =>
          n2 match {
            case 2 if w2 == 2 => pkg = str(p2)
            case 4 if w2 == 2 => msgs += p2
            case 5 if w2 == 2 => ens += p2
            case _ =>
          }
        }
        val scope = if (pkg.isEmpty) "" else s"$pkg."
        msgs.result().foreach(parseMessage(_, scope))
        ens.result().foreach(parseEnum(_, scope))
      }
    }
    Registry(messages.result(), enums.result())
  }
}
