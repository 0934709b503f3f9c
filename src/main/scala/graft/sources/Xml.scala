package graft.sources

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** XML read via streaming StAX extraction of elements matching a path query
  * (reference: xml/XmlToIon.java:200-289 — StAX push-down skipping
  * non-matching subtrees, XXE disabled :208-210; whole-doc mode :143-198
  * with root-array unwrap). Matched subtrees become JSON rows fed to
  * Spark's JSON reader, keeping schema inference Catalyst-side.
  */
object Xml {

  /** one row per element whose path matches `query` (e.g. "/catalog/book");
    * empty query → the document root itself (one row per file).
    * `forceList` names elements that must ALWAYS parse as arrays, even with
    * a single child — without it the shape flips between struct and array
    * by data (≙ reference parserConfiguration.forceList, XmlToIon.java:420)
    */
  def read(spark: SparkSession, path: String, query: String = "",
      forceList: Set[String] = Set.empty): DataFrame = {
    import spark.implicits._
    val jsonRows = spark.read.option("wholetext", true).text(path)
      .as[String]
      .flatMap(whole => extractJson(whole, query, forceList))
    spark.read.json(jsonRows)
  }

  private[sources] def extractJson(xml: String, query: String,
      forceList: Set[String] = Set.empty): Seq[String] = {
    val factory = XMLInputFactory.newInstance()
    // XXE disabled, like the reference (xml/XmlToIon.java:208-210)
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val reader = factory.createXMLStreamReader(new java.io.StringReader(xml))
    val wanted: List[String] =
      query.split("/").toList.filter(_.nonEmpty)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val stack = scala.collection.mutable.ListBuffer.empty[String]
    while (reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          stack += reader.getLocalName
          val matches =
            if (wanted.isEmpty) stack.length == 1
            else stack.toList == wanted
          if (matches) {
            val node = readElement(reader, mapper, forceList)
            out += mapper.writeValueAsString(node)
            stack.remove(stack.length - 1) // readElement consumed END_ELEMENT
          }
        case XMLStreamConstants.END_ELEMENT =>
          if (stack.nonEmpty) stack.remove(stack.length - 1)
        case _ =>
      }
    }
    reader.close()
    out.toSeq
  }

  /** consume the current element (cursor on START_ELEMENT) into a JsonNode:
    * attributes as fields, repeated children as arrays, text as value
    */
  private def readElement(
      reader: XMLStreamReader,
      mapper: com.fasterxml.jackson.databind.ObjectMapper,
      forceList: Set[String] = Set.empty): com.fasterxml.jackson.databind.JsonNode = {
    val obj = mapper.createObjectNode()
    var a = 0
    while (a < reader.getAttributeCount) {
      obj.put(reader.getAttributeLocalName(a), reader.getAttributeValue(a))
      a += 1
    }
    val text = new StringBuilder
    var done = false
    while (!done && reader.hasNext) {
      reader.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          val name = reader.getLocalName
          val child = readElement(reader, mapper, forceList)
          if (obj.has(name)) {
            obj.get(name) match {
              case arr: com.fasterxml.jackson.databind.node.ArrayNode => arr.add(child)
              case prev =>
                val arr = mapper.createArrayNode()
                arr.add(prev); arr.add(child)
                obj.set[com.fasterxml.jackson.databind.JsonNode](name, arr)
                ()
            }
          } else if (forceList(name)) {
            // forced array: a single child still becomes [child]
            val arr = mapper.createArrayNode()
            arr.add(child)
            obj.set[com.fasterxml.jackson.databind.JsonNode](name, arr)
            ()
          } else {
            obj.set[com.fasterxml.jackson.databind.JsonNode](name, child)
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          text ++= reader.getText
        case XMLStreamConstants.END_ELEMENT => done = true
        case _ =>
      }
    }
    val trimmed = text.toString.trim
    if (obj.isEmpty && trimmed.nonEmpty) mapper.getNodeFactory.textNode(trimmed)
    else {
      if (trimmed.nonEmpty) obj.put("_text", trimmed)
      obj
    }
  }

  /** rows → one XML document under `rootName`, each row a `row` element
    * (reference: xml/IonToXml.java:88-171 — but streamed, not collected:
    * the reference's whole-list-in-memory hazard at :143 is avoided)
    */
  def write(df: DataFrame, path: String, rootName: String = "root"): Unit = {
    import df.sparkSession.implicits._
    val mapperRef = new com.fasterxml.jackson.databind.ObjectMapper()
    val rows = df.toJSON.mapPartitions { it =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      it.map(json => toXmlElement("row", mapper.readTree(json)))
    }
    val body = rows.coalesce(1).mapPartitions { it =>
      Iterator(s"<$rootName>") ++ it ++ Iterator(s"</$rootName>")
    }
    body.write.mode("overwrite").text(path)
  }

  private[sources] def toXmlElement(name: String, node: com.fasterxml.jackson.databind.JsonNode): String = {
    val sb = new StringBuilder
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def emit(n: String, v: com.fasterxml.jackson.databind.JsonNode): Unit = {
      if (v.isArray) {
        v.forEach(e => emit(n, e))
      } else if (v.isObject) {
        sb ++= s"<$n>"
        v.properties().forEach(e => emit(e.getKey, e.getValue))
        sb ++= s"</$n>"
      } else if (v.isNull) sb ++= s"<$n/>"
      else sb ++= s"<$n>${esc(v.asText)}</$n>"
    }
    emit(name, node)
    sb.toString
  }
}
