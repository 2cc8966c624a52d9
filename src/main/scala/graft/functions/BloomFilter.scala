package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Shared bloom-filter bit math — ONE definition of the hash family and
  * bit layout used by both the build aggregate and the probe
  * expression, so a bit set by [[BloomFilterAgg]] is found by
  * [[BloomMightContain]] (no false negatives by construction).
  *
  * Double hashing (Kirsch–Mitzenmahcer): g_i(x) = h1(x) + i·h2(x)
  * mod m preserves the classic FPR bound with two XXH64 evaluations per
  * key instead of k. The build buffer is `Array[Long]` words; the probe
  * side reads the little-endian serialized bytes, and the layout maps
  * bit b to byte b>>>3, bit b&7 on both representations.
  */
object Bloom {
  def hash(key: Long, seed: Long): Long =
    XxHash64Function.hash(key, LongType, seed)

  def add(words: Array[Long], numBits: Int, key: Long, numHashes: Int): Unit = {
    val h1 = hash(key, 42L)
    val h2 = hash(key, 77L)
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Math.floorMod(h1 + i * h2, numBits.toLong).toInt
      words(idx >>> 6) |= (1L << (idx & 63))
      i += 1
    }
  }

  /** Probe against the serialized filter. Called from generated code. */
  def contains(bytes: Array[Byte], key: Long, numHashes: Int): Boolean = {
    val numBits = bytes.length.toLong * 8L
    val h1 = hash(key, 42L)
    val h2 = hash(key, 77L)
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Math.floorMod(h1 + i * h2, numBits)
      if ((bytes((idx >>> 3).toInt) & (1 << (idx & 7).toInt)) == 0) return false
      i += 1
    }
    true
  }

  def serialize(words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(words)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(out)
    out
  }
}

/** `bloom_filter(key[, numBits[, numHashes]])` — build a bloom filter
  * over a long key column as a `TypedImperativeAggregate`: partial
  * filters build map-side, merge by bitwise OR (commutative,
  * associative, idempotent — partitioning-invariant), and exactly
  * numBits/8 bytes cross the shuffle per group REGARDLESS of input
  * cardinality. The evaluated value is the little-endian serialized
  * filter, probe-able by [[BloomMightContain]].
  *
  * This is the build side of the runtime-filter pattern (sideways
  * information passing): at 100 TB the filter summarizes a dim-side key
  * set too large to broadcast as rows into a fixed 128 KiB bitset that
  * ships into the fact scan's filter.
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int = 1 << 20,
    numHashes: Int = 5,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType
        if numBits >= 64 && numBits % 64 == 0 && numHashes >= 1 && numHashes <= 16 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_filter expects an integral key, numBits a positive multiple of 64 " +
        s"and 1 <= numHashes <= 16; got $t numBits=$numBits numHashes=$numHashes")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_filter"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v match {
        case b: Byte => b.toLong
        case s: Short => s.toLong
        case i: Int => i.toLong
        case l: Long => l
      }
      Bloom.add(buf, numBits, key, numHashes)
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = Bloom.serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = Bloom.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Bloom.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren.head)
}

/** `bloom_might_contain(key, filterBytes[, numHashes])` — probe a
  * serialized bloom filter, as a codegen expression: the probe runs in
  * the fact table's scan stage (the 100 TB hot path — one call per fact
  * row), so `doGenCode` emits a direct static call instead of routing
  * each row through interpreted higher-order functions. Guaranteed no
  * false negatives against [[BloomFilterAgg]] (shared [[Bloom]] math);
  * false positives are possible and must be removed by the exact join
  * that follows.
  */
case class BloomMightContain(left: Expression, right: Expression,
                             numHashes: Int = 5)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ByteType | ShortType | IntegerType | LongType, BinaryType)
        if numHashes >= 1 && numHashes <= 16 =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects (integral key, binary filter), got $l / $r")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(k: Any, f: Any): Any = {
    val key = k match {
      case b: Byte => b.toLong
      case s: Short => s.toLong
      case i: Int => i.toLong
      case l: Long => l
    }
    Bloom.contains(f.asInstanceOf[Array[Byte]], key, numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k, f) =>
      s"${ev.value} = graft.functions.Bloom.contains($f, (long) $k, $numHashes);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomFilterAgg {
  /** Column API for the build aggregate. */
  def bloomFilter(key: Column, numBits: Int = 1 << 20, numHashes: Int = 5): Column =
    GraftSqlShim.column(
      BloomFilterAgg(GraftSqlShim.expression(key), numBits, numHashes)
        .toAggregateExpression())

  /** Column API for the probe. */
  def bloomMightContain(key: Column, filter: Column, numHashes: Int = 5): Column =
    GraftSqlShim.column(BloomMightContain(
      GraftSqlShim.expression(key), GraftSqlShim.expression(filter), numHashes))
}
