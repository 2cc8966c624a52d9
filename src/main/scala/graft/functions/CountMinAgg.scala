package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `count_min(col, depth, width)` — count-min sketch (Cormode &
  * Muthukrishnan, J. Algorithms 2005) as the third custom
  * `TypedImperativeAggregate` beside [[HllSketchAgg]] and
  * [[MisraGriesAgg]]: a depth×width matrix of counters crosses the
  * shuffle per group — fixed 8·d·w bytes regardless of vocabulary —
  * where the exact formulation shuffles every distinct value. Point
  * estimate for a key = min over rows i of cell(i, h_i(key)); always an
  * OVERestimate (collisions only add).
  *
  * Two properties the other two sketches lack, both load-bearing here:
  *
  *  - **Merge is elementwise sum — exact, order-independent.** The
  *    merged sketch equals the sketch of the concatenated input under
  *    ANY partitioning, so the result is deterministic (HLL's register
  *    maxes are too, but MG's decrements are not).
  *  - **The hash is engine-portable** (md5("i:" || key), first 8 hex
  *    chars mod width — the [[graft.ext.Sampling]] discipline), so an
  *    oracle can REBUILD the identical sketch in SQL: cell (i,b) =
  *    Σ counts of keys hashing to b in row i. The registered query is
  *    therefore hash-oracled EXACTLY — the only sketch family whose
  *    estimates are inside the driver's exact gate, not rows-only.
  *    (At 100 TB swap the hash for xxhash64 and keep the structure;
  *    md5 costs ~2× but buys cross-engine verifiability.)
  */
case class CountMinAgg(
    child: Expression,
    depth: Int = 4,
    width: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if depth >= 1 && depth <= 16 && width >= 2 && width <= 65536 =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_min expects a string column, 1 <= depth <= 16, 2 <= width <= 65536; " +
        s"got $t depth=$depth width=$width")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  // flattened row-major: cell (i, b) at index i*width + b
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      var i = 0
      while (i < depth) {
        buf(i * width + CountMinAgg.bucket(i, s, width)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bytes.putLong)
    bytes.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

object CountMinAgg {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Row-i bucket of `key`: first 8 hex chars of md5("i:key") mod
    * width — reproducible as
    * `CAST(('0x' || substr(md5(i || ':' || key), 1, 8)) AS BIGINT) % width`
    * in ANSI SQL, which is what makes the sketch oracle-checkable.
    */
  def bucket(i: Int, key: String, width: Int): Int = {
    val d = md5.get()
    d.reset()
    val h = d.digest(s"$i:$key".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 8 hex chars = first 4 bytes, big-endian, as an unsigned int
    val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    (v % width).toInt
  }

  /** Column API — usable anywhere a built-in aggregate is. */
  def countMin(c: Column, depth: Int = 4, width: Int = 256): Column =
    GraftSqlShim.column(
      CountMinAgg(GraftSqlShim.expression(c), depth, width).toAggregateExpression())
}
