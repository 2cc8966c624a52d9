package graft.plans

import scala.collection.mutable

import graft.{Q, Tables}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** `TOP K PER KEY` — a whole custom operator (logical node → strategy →
  * two-phase physical plan), the one place in this engine where Spark's
  * built-ins genuinely cannot express the efficient plan:
  *
  * The composable formulation (`row_number().over(Window.partitionBy(key)
  * .orderBy(ord)) <= k`) must SHUFFLE EVERY ROW and SORT each key's whole
  * partition before discarding all but k rows. For top-k-neighbors over an
  * all-pairs similarity join (|queries|·|corpus| rows) that shuffle is the
  * dominant cost at scale. The right plan — what this operator emits — is
  * the aggregate shape instead:
  *
  *   PartialTopKExec   per input partition, one bounded k-heap per key —
  *                     map-side; at most k rows per (partition, key)
  *                     survive to the exchange
  *   → Exchange        hash partition by key (inserted automatically by
  *                     `requiredChildDistribution`)
  *   → FinalTopKExec   re-heap the ≤ k·P survivors per key, emit rank
  *
  * Shuffle volume drops from |rows| to ≤ k·P·|keys| — the same partial/
  * final trick hash aggregation uses, applied to an order statistic.
  * Results are identical to the window formulation (oracle-checked via
  * the `topk_per_key` query, equivalence-tested against the window form).
  */
case class TopKPerKey(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    rankAttr: Attribute, child: LogicalPlan,
    pinParallelism: Boolean = false) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rank is born here, not read from the child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, rankAttr, child, pin) =>
      FinalTopKExec(keys, order, k, rankAttr,
        PartialTopKExec(keys, order, k, planLater(child)), pin) :: Nil
    case _ => Nil
  }
}

private[plans] object TopKHeaps {
  /** Per-key bounded heaps over an input partition. Returns each key's
    * rows in rank order. Memory: O(k · distinct keys in partition).
    */
  def topKPerPartition(
      it: Iterator[InternalRow], keys: Seq[Expression], order: Seq[SortOrder],
      inputAttrs: Seq[Attribute], k: Int): Iterator[(UnsafeRow, Seq[InternalRow])] = {
    val keyProj = UnsafeProjection.create(keys, inputAttrs)
    val ordering = GenerateOrdering.generate(order, inputAttrs)
    // max-heap under `ordering` (head = worst kept row)
    val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    it.foreach { row =>
      val key = keyProj(row)
      heaps.get(key) match {
        case Some(heap) =>
          if (heap.size < k) heap.enqueue(row.copy())
          else if (ordering.compare(row, heap.head) < 0) {
            heap.dequeue(); heap.enqueue(row.copy())
          }
        case None =>
          val heap = mutable.PriorityQueue.empty[InternalRow](ordering)
          heap.enqueue(row.copy())
          heaps.put(key.copy(), heap)
      }
    }
    heaps.iterator.map { case (key, heap) => (key, heap.dequeueAll.reverse) }
  }
}

case class PartialTopKExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] = UnspecifiedDistribution :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, attrs, kk) = (keys, order, child.output, k)
    child.execute().mapPartitions { it =>
      TopKHeaps.topKPerPartition(it, ks, os, attrs, kk).flatMap(_._2)
    }
  }
  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKExec =
    copy(child = newChild)
}

case class FinalTopKExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    rankAttr: Attribute, child: SparkPlan,
    pinParallelism: Boolean = false) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // `pinParallelism` holds the exchange at the session's shuffle
  // parallelism: the heap merge is CPU-bound per ROW but its shuffle is
  // narrow (the partial stage already cut it to <= k rows per key per
  // partition), so AQE's byte-based coalescing can collapse it to 1-2
  // partitions and serialize the final stage — measured on
  // tfidf_top_terms at the 10x probe: 1 partition at sf0.1, 2 at 10x,
  // ratio 2.18 from lost parallelism alone (every other stage of that
  // query scales flat; pinned, the ratio is 1.58). OFF by default:
  // iterative consumers with tiny per-round top-k stages (PQ/IVF
  // assignment argmax) measured ~50% SLOWER under a blanket pin — for
  // them the coalescing is the right call, and callers with a
  // many-keys × narrow-rows final stage opt in per call site.
  override def requiredChildDistribution: Seq[Distribution] =
    (if (pinParallelism)
      ClusteredDistribution(keys,
        requiredNumPartitions = Some(conf.numShufflePartitions))
    else ClusteredDistribution(keys)) :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, attrs, kk, out) = (keys, order, child.output, k, output)
    child.execute().mapPartitions { it =>
      val resultProj = UnsafeProjection.create(out, out)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      TopKHeaps.topKPerPartition(it, ks, os, attrs, kk).flatMap { case (_, rows) =>
        rows.iterator.zipWithIndex.map { case (row, i) =>
          resultProj(joined(row, InternalRow(i + 1))).copy()
        }
      }
    }
  }
  override protected def withNewChildInternal(newChild: SparkPlan): FinalTopKExec =
    copy(child = newChild)
}

object TopKPerKey {

  /** Public API: top `k` rows per `keys` group ordered by `order`
    * ((column, descending) pairs), with a 1-based `rank` column appended.
    * Identical semantics to `row_number().over(Window.partitionBy(keys)
    * .orderBy(order)) <= k`, planned as partial+final bounded heaps.
    * `order` must be total within a key (include a tiebreaker) for
    * deterministic results. Columns are resolved by name against `df` —
    * the node is constructed fully resolved, no analyzer round trip.
    */
  def topKPerKey(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)], k: Int,
                 rankName: String = "rank",
                 pinParallelism: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val analyzed = df.queryExecution.analyzed
    // resolve like Spark does — honoring spark.sql.caseSensitive — and
    // refuse ambiguity (duplicate names after a self-join would otherwise
    // silently rank by whichever side happened to come first)
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def attr(n: String): Attribute = {
      val hits = analyzed.output.filter(a =>
        if (caseSensitive) a.name == n else a.name.equalsIgnoreCase(n))
      hits match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"column $n not in ${analyzed.output.map(_.name).mkString(",")}")
        case many => throw new IllegalArgumentException(
          s"column $n is ambiguous: ${many.mkString(", ")}")
      }
    }
    val keyExprs = keys.map(attr(_): Expression)
    val orderExprs = order.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    GraftSqlShim.ofRows(spark,
      TopKPerKey(keyExprs, orderExprs, k, rankAttr, analyzed, pinParallelism))
  }

  val queries: Map[String, Q] = Map(
    // top-3 lineitems per supplier by price — through the custom operator.
    "topk_per_key" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
      topKPerKey(li, Seq("l_suppkey"),
        Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)), k = 3)
    }),

    // the SAME query in the standard window FORMULATION, rewritten into
    // the TopKPerKey plan by the injected optimizer rule (TopKRewrite) —
    // shares the API form's oracle, so the rewrite's semantics
    // preservation is hash-checked, and TopKPerKeySpec pins that the
    // executed plan really is the partial/final heap pair
    "topk_window_rewrite" -> ((s, dir) => {
      if (!s.experimental.extraStrategies.contains(TopKStrategy))
        s.experimental.extraStrategies =
          s.experimental.extraStrategies :+ TopKStrategy
      if (!s.experimental.extraOptimizations.contains(TopKRewrite))
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ TopKRewrite
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, dir)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
    }),

    // the AGGREGATE-FUNCTION face (functions.TopKAgg): per-group top-5
    // prices through the SQL-callable bounded-heap aggregate, exploded
    // back to rows — exact and merge-order invariant, so unlike the
    // other sketch aggregates it is fully oracled against the window
    // formulation
    "topk_agg_check" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"),
          (col("l_orderkey") * 8 + col("l_linenumber")).as("payload"))
      li.groupBy(col("l_returnflag"))
        .agg(graft.functions.TopKAgg.topkPairs(
          col("cents"), col("payload"), 5).as("top"))
        .select(col("l_returnflag"), explode(col("top")).as("e"))
        .select(col("l_returnflag"), col("e.rank").as("rank"),
          col("e.ord").as("cents"), col("e.payload").as("payload"))
    })
  )

  private val topkOracle =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
      |  CAST(row_number() OVER w AS INTEGER) AS rank
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_suppkey
      |  ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber)
      |QUALIFY row_number() OVER w <= 3""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "topk_per_key" -> topkOracle,
    // identical semantics by construction — the rewrite must not change
    // a single row
    "topk_window_rewrite" -> topkOracle,
    "topk_agg_check" ->
      """WITH v AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    CAST(l_orderkey * 8 + l_linenumber AS BIGINT) AS payload
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  CAST(row_number() OVER w AS INTEGER) AS rank, cents, payload
        |FROM v
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY cents DESC, payload)
        |QUALIFY row_number() OVER w <= 5""".stripMargin
  )
}
