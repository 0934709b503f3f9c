package graft.engine

import graft.model.EncodedBlock
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

/** The decode pass: regroup a block table by (partId, blockIdx), decode each
  * column block, and zip the columns back into rows — the inverse of
  * BlockCodec, and the analog of the reference's validated decode path
  * (reference: avro/AvroToIon.java:88-136). Bit-identity of every value is
  * the contract (sha256-per-row verified in graft.verify).
  */
object Decoder {

  def decode(blocks: Dataset[EncodedBlock], cols: Seq[String]): DataFrame = {
    val colNames = cols.toArray
    val binSchema = StructType(colNames.map(c => StructField(c, BinaryType, nullable = true)))
    val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt)
    val grouped = blocks.groupByKey(b => (b.partId, b.blockIdx))(keyEnc)
    val binary = grouped.flatMapGroups { (_, it) =>
      val byCol = scala.collection.mutable.HashMap.empty[String, EncodedBlock]
      it.foreach(b => byCol(b.colName) = b)
      val decoded: Array[Array[Array[Byte]]] =
        colNames.map(c => BlockCodec.decodeBlock(byCol.getOrElse(c,
          throw new IllegalStateException(
            s"missing column block '$c' (have ${byCol.keys.mkString(",")})"))))
      val n = decoded(0).length
      (0 until n).iterator.map { i =>
        val vals = new Array[Any](colNames.length)
        var c = 0
        while (c < colNames.length) {
          vals(c) = decoded(c)(i)
          c += 1
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
      }
    }(Encoders.row(binSchema))
    // binary → string cast restores the exact UTF-8 content (codegen'd)
    binary.select(colNames.map(c => org.apache.spark.sql.functions.col(c)
      .cast("string").as(c)): _*)
  }
}
