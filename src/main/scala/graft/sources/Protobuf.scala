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
