package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Sign-random-projection band signatures as a native codegen'd expression —
  * the LSH feature extractor of the embedding queries. The arithmetic is
  * IDENTICAL to the prior typed flatMap in EmbedQueries.bandSignatures
  * (fixed-order double dot products over EmbedQueries.planeWeight planes,
  * NaN-proof sign test), so the signatures are bit-identical and the DuckDB
  * oracle replay is untouched; the projection now stays inside
  * WholeStageCodegen instead of paying an encoder ser/de round-trip per
  * vector (Seq[Float] boxing both ways).
  */
object BandSigImpl {
  private val Dim = 64 // embedding dim pinned by the corpus contract

  private val planesCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Double]]]()

  private def planes(bands: Int, bits: Int): Array[Array[Double]] =
    planesCache.computeIfAbsent((bands.toLong << 32) | bits.toLong, _ =>
      Array.tabulate(bands * bits, Dim)((p, j) =>
        graft.queries.EmbedQueries.planeWeight(p, j)))

  def signatures(emb: ArrayData, bands: Int, bits: Int): ArrayData = {
    val pls = planes(bands, bits)
    val n = emb.numElements()
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var sig = 0
      var p = 0
      while (p < bits) {
        var dot = 0.0
        var j = 0
        val pl = pls(b * bits + p)
        while (j < Dim && j < n) { dot += pl(j) * emb.getFloat(j); j += 1 }
        // NaN-proof sign test, matching the oracle (DuckDB sorts NaN
        // greatest) — same rule as the prior flatMap
        if (java.lang.Double.isNaN(dot) || dot >= 0) sig |= (1 << p)
        p += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** bandsigs64(array<float>): LshBands sign-projection signatures, one int
  * per band (bits is a plan constant).
  */
case class BandSignatures64(child: Expression, bands: Int, bits: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bandsigs64 needs array<float>, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    BandSigImpl.signatures(v.asInstanceOf[ArrayData], bands, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = BandSigImpl.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $impl.signatures($c, $bands, $bits);")
  }

  override protected def withNewChildInternal(newChild: Expression): BandSignatures64 =
    copy(child = newChild)

  override def prettyName: String = "bandsigs64"
}

object embedFunctions {
  private def wrap(e: Expression): Column =
    org.apache.spark.sql.GraftBridge.column(e)
  private def expr(c: Column): Expression =
    org.apache.spark.sql.GraftBridge.expression(c)

  def bandSigs64(c: Column, bands: Int, bits: Int): Column =
    wrap(BandSignatures64(expr(c), bands, bits))
}
