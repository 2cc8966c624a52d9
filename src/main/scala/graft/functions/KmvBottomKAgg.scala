package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** `kmv_bottomk(col, k)` — the k-minimum-values sketch (Bar-Yossef et
  * al., RANDOM'02; Beyer et al., SIGMOD'07) as the fourth custom
  * `TypedImperativeAggregate`: keep the k SMALLEST distinct values of a
  * portable 60-bit hash of the column. One ≤k-long buffer per group
  * crosses the shuffle, and the result is BOTH
  *
  *  - a deterministic uniform sample of the group's distinct values
  *    (the md5-order discipline of `corpus_shuffle_order`, as a
  *    MERGEABLE aggregate — union of sketches = sketch of union,
  *    exactly), and
  *  - a distinct-count estimator: D̂ = (k−1)·2⁶⁰ div h_k — an
  *    alternative to HLL whose sketch doubles as a sample and supports
  *    set operations (intersection estimates via the bottom-k of the
  *    union).
  *
  * Unlike HLL/CMS (register state, rows-only by contract), the KMV
  * sketch is EXACTLY oracle-able: the hash is the engine-portable md5
  * path (first 15 hex chars → long, the [[CountMinAgg]] argument), and
  * "k smallest distinct hashes" is a plain ORDER BY + LIMIT any engine
  * reproduces bit-for-bit — no merge-order ambiguity exists because
  * min-k of a set is merge-invariant.
  */
case class KmvBottomKAgg(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 && k <= 65536 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_bottomk expects a string column and 1 <= k <= 65536, got $t k=$k")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_bottomk"

  /** First 15 hex chars of md5(value) as a long — 60 bits, portable:
    * `CAST(('0x' || substr(md5(v), 1, 15)) AS BIGINT)` in any engine.
    */
  private def hash60(s: String): Long = {
    val d = KmvBottomKAgg.md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // 15 hex chars = 7.5 bytes: the top 60 bits of the digest
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (bytes(i) & 0xffL); i += 1 }
    (h << 4) | ((bytes(7) & 0xf0L) >> 4)
  }

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = hash60(v.toString)
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { buf.add(h); if (buf.size > k) buf.remove(buf.last) }
    }
    buf
  }

  override def merge(a: mutable.TreeSet[Long], b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b.foreach(a.add)
    while (a.size > k) a.remove(a.last)
    a
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray) // TreeSet iterates ascending

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBottomKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvBottomKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvBottomKAgg =
    copy(child = newChildren.head)
}

object KmvBottomKAgg {

  // companion-object ThreadLocal: the case class is serialized to
  // executors and an anonymous ThreadLocal field would fail
  // Task-not-serializable (the CountMinAgg discipline)
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Column API. */
  def kmvBottomK(c: Column, k: Int = 64): Column =
    GraftSqlShim.column(
      KmvBottomKAgg(GraftSqlShim.expression(c), k).toAggregateExpression())
}
