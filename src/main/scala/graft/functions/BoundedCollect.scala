package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** bounded_collect_long(col, cap): collect the group's long values, but
  * STOP growing the buffer at cap+1 elements and evaluate to NULL for any
  * group with more than `cap` rows — the fused form of the dedup/LSH
  * "count buckets, drop the ones over the cap, join the survivors back,
  * collect" pattern. One aggregate replaces a count aggregate + a join,
  * and the memory bound is cap+1 longs per group at ANY corpus size
  * (partial buffers are capped too, so a degenerate bucket of 10^9 rows
  * ships at most cap+1 longs per map partition — strictly tighter than
  * the old two-phase shape, which shipped every row of every bucket into
  * the count).
  *
  * Exact equivalence with the two-phase pattern: a group evaluates to its
  * FULL value list iff its row count <= cap (nothing is dropped below the
  * cap), and to NULL iff the count exceeds cap (the old `where df <= cap`
  * / bucket-cap filter). Values must be non-null (the dedup keys are).
  */
case class BoundedCollectLong(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]] {

  require(cap >= 1, s"bounded_collect_long needs cap >= 1, got $cap")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedCollectLong =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bounded_collect_long needs bigint, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Long] =
    scala.collection.mutable.ArrayBuffer.empty[Long]

  override def update(
      buffer: scala.collection.mutable.ArrayBuffer[Long],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[Long] = {
    // grow to at most cap+1: the (cap+1)-th element is the over-cap proof;
    // further rows change nothing (the group is already condemned)
    val v = child.eval(input)
    // the dedup/LSH keys are non-null by construction; a null here would
    // silently skew the cap accounting vs the count-based shape this
    // aggregate replaced — refuse loudly rather than diverge
    if (v == null)
      throw new IllegalStateException("bounded_collect_long: null input value")
    if (buffer.length <= cap) buffer += v.asInstanceOf[Long]
    buffer
  }

  override def merge(
      buffer: scala.collection.mutable.ArrayBuffer[Long],
      other: scala.collection.mutable.ArrayBuffer[Long]): scala.collection.mutable.ArrayBuffer[Long] = {
    var i = 0
    while (i < other.length && buffer.length <= cap) {
      buffer += other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: scala.collection.mutable.ArrayBuffer[Long]): Any =
    if (buffer.length > cap) null else new GenericArrayData(buffer.toArray)

  override def serialize(
      buffer: scala.collection.mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new scala.collection.mutable.ArrayBuffer[Long](bytes.length / 8)
    while (bb.remaining() >= 8) out += bb.getLong()
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectLong =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "bounded_collect_long"
}

/** bounded_collect_long_pair((k, v), cap): the two-column variant of
  * BoundedCollectLong — collects (k, v) long pairs, NULL over the cap.
  * Lets a consumer carry a per-row attribute (e.g. the doc's shingle-set
  * size) through the bucket aggregate instead of joining it back on
  * afterwards; alignment of k and v is by construction (one buffer).
  */
case class BoundedCollectLongPair(
    key: Expression,
    value: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]] {

  require(cap >= 1, s"bounded_collect_long_pair needs cap >= 1, got $cap")

  override def children: Seq[Expression] = Seq(key, value)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedCollectLongPair =
    copy(key = newChildren(0), value = newChildren(1))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (key.dataType == LongType && value.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bounded_collect_long_pair needs (bigint, bigint), got " +
        s"(${key.dataType.catalogString}, ${value.dataType.catalogString})")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("v", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  // flat (k, v) interleaved buffer; length in PAIRS is buffer.length / 2
  override def createAggregationBuffer(): scala.collection.mutable.ArrayBuffer[Long] =
    scala.collection.mutable.ArrayBuffer.empty[Long]

  override def update(
      buffer: scala.collection.mutable.ArrayBuffer[Long],
      input: InternalRow): scala.collection.mutable.ArrayBuffer[Long] = {
    val k = key.eval(input)
    val v = value.eval(input)
    // same loud-null contract as BoundedCollectLong
    if (k == null || v == null)
      throw new IllegalStateException("bounded_collect_long_pair: null input value")
    if (buffer.length <= 2 * cap) {
      buffer += k.asInstanceOf[Long]
      buffer += v.asInstanceOf[Long]
    }
    buffer
  }

  override def merge(
      buffer: scala.collection.mutable.ArrayBuffer[Long],
      other: scala.collection.mutable.ArrayBuffer[Long]): scala.collection.mutable.ArrayBuffer[Long] = {
    var i = 0
    while (i < other.length && buffer.length <= 2 * cap) {
      buffer += other(i)
      buffer += other(i + 1)
      i += 2
    }
    buffer
  }

  override def eval(buffer: scala.collection.mutable.ArrayBuffer[Long]): Any =
    if (buffer.length > 2 * cap) null
    else {
      val out = new Array[Any](buffer.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = InternalRow(buffer(2 * i), buffer(2 * i + 1))
        i += 1
      }
      new GenericArrayData(out)
    }

  override def serialize(
      buffer: scala.collection.mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new scala.collection.mutable.ArrayBuffer[Long](bytes.length / 8)
    while (bb.remaining() >= 8) out += bb.getLong()
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectLongPair =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectLongPair =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "bounded_collect_long_pair"
}

/** bounded_topk_by_count((cnt, key), k): the group's top-k (cnt, key)
  * pairs under ORDER BY cnt DESC, key ASC — the profile-build shape of the
  * lang-id query, as an aggregate instead of a row_number window. Exactly
  * the window's rnk <= k row set; the buffer holds at most 2k entries
  * before re-truncating, so partial (map-side) aggregation ships <= k rows
  * per group per map partition where the window shipped EVERY row into its
  * sort (guide §2.3: aggregate before you shuffle).
  */
case class BoundedTopKByCount(
    cnt: Expression,
    key: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[(Long, org.apache.spark.unsafe.types.UTF8String)]] {

  import org.apache.spark.unsafe.types.UTF8String
  private type Buf = scala.collection.mutable.ArrayBuffer[(Long, UTF8String)]

  require(k >= 1, s"bounded_topk_by_count needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(cnt, key)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopKByCount =
    copy(cnt = newChildren(0), key = newChildren(1))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (cnt.dataType == LongType &&
        key.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bounded_topk_by_count needs (bigint, string), got " +
        s"(${cnt.dataType.catalogString}, ${key.dataType.catalogString})")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("c", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("tri",
        org.apache.spark.sql.types.StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  // (cnt desc, key asc) total order — the window's EXACT ordering: keys
  // compare as UTF8String (binary/UTF-8), not java.lang.String (UTF-16) —
  // the two disagree on supplementary vs U+E000..U+FFFF characters, the
  // repo's documented codepoint-divergence class
  private def lt(a: (Long, UTF8String), b: (Long, UTF8String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2.compareTo(b._2) < 0)

  private def truncate(buf: Buf): Buf =
    if (buf.length <= k) buf
    else {
      val kept = buf.sortWith(lt).take(k)
      buf.clear()
      buf ++= kept
    }

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.ArrayBuffer.empty

  override def update(buffer: Buf, input: InternalRow): Buf = {
    val c = cnt.eval(input)
    val s = key.eval(input)
    if (c != null && s != null) {
      // clone: the evaluated UTF8String may view a reused row buffer
      buffer += ((c.asInstanceOf[Long], s.asInstanceOf[UTF8String].clone()))
      if (buffer.length >= 2 * k) truncate(buffer)
    }
    buffer
  }

  override def merge(buffer: Buf, other: Buf): Buf = {
    buffer ++= other
    truncate(buffer)
  }

  override def eval(buffer: Buf): Any = {
    val top = buffer.sortWith(lt).take(k)
    new GenericArrayData(top.map { case (c, s) => InternalRow(c, s): Any }.toArray)
  }

  override def serialize(buffer: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.length)
    buffer.foreach { case (c, s) =>
      out.writeLong(c)
      val b = s.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val out = new scala.collection.mutable.ArrayBuffer[(Long, UTF8String)](n)
    var i = 0
    while (i < n) {
      val c = in.readLong()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      out += ((c, UTF8String.fromBytes(b)))
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKByCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKByCount =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "bounded_topk_by_count"
}

object boundedCollectFunctions {
  def boundedCollectLong(c: Column, cap: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      BoundedCollectLong(org.apache.spark.sql.GraftBridge.expression(c), cap)
        .toAggregateExpression())
  def boundedCollectLongPair(k: Column, v: Column, cap: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      BoundedCollectLongPair(
        org.apache.spark.sql.GraftBridge.expression(k),
        org.apache.spark.sql.GraftBridge.expression(v), cap)
        .toAggregateExpression())
  def boundedTopKByCount(cnt: Column, key: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      BoundedTopKByCount(
        org.apache.spark.sql.GraftBridge.expression(cnt),
        org.apache.spark.sql.GraftBridge.expression(key), k)
        .toAggregateExpression())
}
