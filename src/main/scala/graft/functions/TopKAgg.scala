package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** `topk_pairs(ord, payload, k)` — exact bounded-heap per-group top-k
  * as an AGGREGATE FUNCTION: the SQL-callable face of the TopKPerKey
  * physical operator (plans/TopKPerKey.scala), for users who group in
  * plain SQL rather than the API. Fifth custom
  * `TypedImperativeAggregate` beside HLL / Misra–Gries / CMS / KMV —
  * and like KMV it is fully HASH-EXACT: the k largest (ord, payload)
  * pairs of a multiset under the total order (ord desc, payload asc)
  * are merge-order invariant, so the whole result goes through the
  * DuckDB oracle gate, not a rows-only check.
  *
  * ≤ k 16-byte pairs per group cross the shuffle regardless of group
  * size (the partial aggregate trims on update), vs a window
  * formulation that shuffles and sorts every row. Buffer is a
  * worst-first binary heap: O(log k) per update at capacity.
  */
case class TopKAgg(
    ordExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  override def checkInputDataTypes(): TypeCheckResult =
    (ordExpr.dataType, payloadExpr.dataType) match {
      case (LongType, LongType) if k >= 1 && k <= 65536 =>
        TypeCheckResult.TypeCheckSuccess
      case (o, p) => TypeCheckResult.TypeCheckFailure(
        s"topk_pairs expects two long columns and 1 <= k <= 65536, got ($o, $p) k=$k")
    }

  override def children: Seq[Expression] = Seq(ordExpr, payloadExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("ord", LongType, nullable = false),
    StructField("payload", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_pairs"

  // worst element first: smallest ord, then LARGEST payload (the pair
  // that loses to every other under (ord desc, payload asc))
  private val worstFirst: Ordering[(Long, Long)] =
    Ordering.by[(Long, Long), (Long, Long)] { case (o, p) => (-o, p) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def insert(buf: mutable.PriorityQueue[(Long, Long)],
                     pair: (Long, Long)): Unit = {
    if (buf.size < k) buf.enqueue(pair)
    else if (worstFirst.compare(pair, buf.head) < 0) { // pair beats worst
      buf.dequeue(); buf.enqueue(pair)
    }
  }

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val o = ordExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (o != null && p != null)
      insert(buf, (o.asInstanceOf[Long], p.asInstanceOf[Long]))
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Long, Long)],
                     b: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    val sorted = buf.toArray.sortBy { case (o, p) => (-o, p) }
    new GenericArrayData(sorted.zipWithIndex.map { case ((o, p), i) =>
      InternalRow(i + 1, o, p)
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (o, p) => bb.putLong(o); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(ordExpr = newChildren(0), payloadExpr = newChildren(1))
}

object TopKAgg {
  /** Column-API face: `topkPairs(ord, payload, k)`. */
  def topkPairs(ord: Column, payload: Column, k: Int): Column =
    GraftSqlShim.column(
      TopKAgg(GraftSqlShim.expression(ord), GraftSqlShim.expression(payload), k)
        .toAggregateExpression())
}
