package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Seeded 64-bit string hash + array fold hash for the MinHash/LSH path.
  * Chosen over xxhash64 because the whole pipeline must be REPLAYABLE in
  * the DuckDB oracle: polynomial-31 + murmur fmix64 is exactly expressible
  * in HUGEINT mod-2^64 SQL (see OracleSql.minhashLsh), where xxhash64's
  * striped rotations are not practical. Native codegen'd expressions, same
  * pattern as SimHash64.
  */
object MinHashImpl {
  val Golden = 0x9e3779b97f4a7c15L
  val PolySeed = 1125899906842597L

  def fmix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^ (z >>> 33)
  }

  def poly(s: String): Long = {
    // CODEPOINT iteration — the DuckDB oracle replays this polynomial with
    // `ascii(s[i:i])` over codepoints, so a supplementary char must
    // contribute one term, not a surrogate pair (identical on BMP text)
    var h = PolySeed
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = 31 * h + cp
      i += Character.charCount(cp)
    }
    h
  }

  /** seeded string hash: fmix64(poly(s) ^ fmix64(seed * golden)) */
  def hashSeed(s: UTF8String, seed: Long): Long =
    fmix64(poly(s.toString) ^ fmix64(seed * Golden))

  /** the seed-independent polynomial term of hashSeed — computing it once
    * per string and mixing per seed gives bit-identical hashSeed values
    * while scanning the string once instead of once per seed
    */
  def polyU8(s: UTF8String): Long = poly(s.toString)

  /** seedMix must be fmix64(seed * Golden); then mixPoly(polyU8(s), seedMix)
    * == hashSeed(s, seed) by definition
    */
  def seedMix(seed: Long): Long = fmix64(seed * Golden)

  def mixPoly(p: Long, seedMix: Long): Long = fmix64(p ^ seedMix)

  /** order-dependent fold hash of a long array: fmix64(fold(31·acc + v)) */
  def hashLongArray(vs: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    var h = PolySeed
    var i = 0
    while (i < vs.numElements()) { h = 31 * h + vs.getLong(i); i += 1 }
    fmix64(h)
  }

  /** ArrayData.getLong reads a null slot as 0, so a null element would hash
    * like a literal 0 and collide — the expression returns NULL instead
    */
  def hasNullElement(vs: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    var i = 0
    while (i < vs.numElements()) {
      if (vs.isNullAt(i)) return true
      i += 1
    }
    false
  }
}

/** seedhash64(str, seed): 64-bit seeded hash of a string.
  * ImplicitCastInputTypes so a plain SQL integer-literal seed
  * (`seedhash64(text, 0)`) widens to long instead of failing analysis.
  */
case class SeedHash64(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  // Seq is covariant and AbstractDataType is private[sql] — declaring the
  // concrete DataType element type satisfies the trait without naming it
  override def inputTypes: Seq[DataType] = Seq(StringType, LongType)

  override def nullSafeEval(s: Any, seed: Any): Any =
    MinHashImpl.hashSeed(s.asInstanceOf[UTF8String], seed.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = MinHashImpl.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $impl.hashSeed($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SeedHash64 =
    copy(left = l, right = r)

  override def prettyName: String = "seedhash64"
}

/** arrayhash64(array<long>): order-dependent fold hash (band bucketing).
  * An array CONTAINING a null element yields NULL — ArrayData.getLong
  * reads a null slot as 0, and hashing it like a literal 0 would produce a
  * plausible-but-colliding value.
  */
case class ArrayHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable ||
    (child.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    })
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"arrayhash64 needs array<bigint>, got ${other.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val ad = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (MinHashImpl.hasNullElement(ad)) null else MinHashImpl.hashLongArray(ad)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = MinHashImpl.getClass.getName.stripSuffix("$") + "$.MODULE$"
    // when !nullable (containsNull=false schema), ev.isNull is the literal
    // "false" — emitting an assignment to it would not compile; the element
    // scan is also provably unnecessary there
    nullSafeCodeGen(ctx, ev, c =>
      if (nullable) s"""
        if ($impl.hasNullElement($c)) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $impl.hashLongArray($c);
        }"""
      else s"${ev.value} = $impl.hashLongArray($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayHash64 =
    copy(child = newChild)

  override def prettyName: String = "arrayhash64"
}

/** polyhash64(str): the seed-independent polynomial term of seedhash64 —
  * split out so a k-seed MinHash computes the string scan ONCE and mixes k
  * times (mixhash64 below). seedhash64(s, k) ==
  * mixhash64(polyhash64(s), fmix64(k * Golden)) bit-for-bit by definition.
  */
case class PolyHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"polyhash64 needs a string column, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    MinHashImpl.polyU8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = MinHashImpl.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $impl.polyU8($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)

  override def prettyName: String = "polyhash64"
}

/** mixhash64(poly, seedMix): fmix64(poly ^ seedMix) — the per-seed tail of
  * seedhash64 over a precomputed polyhash64 (seedMix = fmix64(seed*Golden),
  * a plan-time constant).
  */
case class MixHash64(left: Expression, right: Expression) extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def nullSafeEval(p: Any, m: Any): Any =
    MinHashImpl.mixPoly(p.asInstanceOf[Long], m.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val impl = MinHashImpl.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $impl.mixPoly($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MixHash64 =
    copy(left = l, right = r)

  override def prettyName: String = "mixhash64"
}

object minhashFunctions {
  private def wrap(e: Expression): Column =
    org.apache.spark.sql.GraftBridge.column(e)
  private def expr(c: Column): Expression =
    org.apache.spark.sql.GraftBridge.expression(c)

  def seedhash64(s: Column, seed: Column): Column =
    wrap(SeedHash64(expr(s), expr(seed)))
  def arrayhash64(a: Column): Column = wrap(ArrayHash64(expr(a)))
  def polyhash64(s: Column): Column = wrap(PolyHash64(expr(s)))
  def mixhash64(p: Column, seedMix: Column): Column =
    wrap(MixHash64(expr(p), expr(seedMix)))
}
