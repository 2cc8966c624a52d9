package graft.ext

import graft.Q
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (fixed-round peel): repeatedly delete every
  * node whose degree in the SURVIVING induced subgraph is below k; what
  * remains after convergence is the k-core (Seidman 1983, "Network
  * structure and minimum degree"). The k-core is the standard "dense
  * backbone" extractor — for a training-data pipeline it is the graph
  * analogue of a support floor: keep only entities that stay
  * well-connected after their weakly-connected neighbours are removed
  * (e.g. products that remain co-purchased once one-hit wonders drop
  * out, or near-dup doc clusters that survive edge pruning).
  *
  * Semantics here are the R-ROUND synchronous peel: round i removes all
  * nodes with induced degree < k simultaneously (the "peel wave"), and
  * the operator emits the survivors of round R with their induced
  * degree. For any graph the wave sequence converges to the true k-core
  * in at most |V| rounds; on the co-purchase graphs this engine feeds
  * it, 3 waves suffice (convergence — wave 4 ≡ wave 3 — is asserted by
  * KCoreSpec at fixture scale, and the emitted degree being ≥ k for
  * every row is itself the convergence witness the oracle re-checks).
  *
  * 100 TB shape: each wave is two shuffles — a semi-join of the edge
  * list against the surviving node set (which SHRINKS monotonically,
  * so Catalyst's size estimates flip it to broadcast as soon as the
  * survivor set is small) and a map-side-combining degree count. No
  * driver state, no collect; R is a constant. This is the relational
  * form of the distributed k-core peel of Montresor, De Pellegrini &
  * Miorandi (TPDS 2013) with synchronous rounds.
  */
object KCore {

  /** Survivors of `rounds` synchronous peel waves at threshold `k` over
    * undirected `edges(u, v)` (canonicalized internally), with their
    * induced degree after the final wave.
    */
  def kcorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val und = edges.select(
        least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    // sym is probed 2+2·rounds times and each wave's survivor set is
    // referenced TWICE (both endpoint semi-joins) — unpersisted, the
    // peel chain re-evaluated 2^rounds times (the PageRank-dangling
    // lineage lesson; measured 8.3 -> ~3 s at sf0.1). Node/edge-sized
    // persists, released by the harness's per-query clearCache.
    val sym = und.unionAll(und.select(col("v").as("u"), col("u").as("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // wave 0 degree = plain degree; wave i filters both endpoints
    // against the previous survivor set before re-counting
    var alive: DataFrame =
      sym.groupBy(col("u").as("node_id")).agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k)
        .select(col("node_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    for (_ <- 2 to rounds) {
      alive = sym
        .join(alive.withColumnRenamed("node_id", "u"), "u")
        .join(alive.select(col("node_id").as("v")), "v")
        .groupBy(col("u").as("node_id")).agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k)
        .select(col("node_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    // final induced degree of the survivors (the emitted witness)
    sym.join(alive.withColumnRenamed("node_id", "u"), "u")
      .join(alive.select(col("node_id").as("v")), "v")
      .groupBy(col("u").as("node_id")).agg(count(lit(1)).as("deg"))
  }

  val queries: Map[String, Q] = Map(
    // 2-core of the relative-support co-purchase graph, 3 peel waves
    // (k=2 keeps the core non-degenerate at every measured scale: the
    // sf0.1 graph is sparser per node — its 3-core is empty)
    "graph_kcore" -> ((s, dir) =>
      kcorePeel(GraphOps.copurchaseEdges(s, dir), k = 2, rounds = 3))
  )

  // Unrolled peel waves over the same co-purchase CTE chain as
  // graph_triangles: v1 = deg >= 2 nodes, v2/v3 re-count inside the
  // survivor-induced subgraph; the SELECT emits v3's induced degrees.
  val oracleSql: Map[String, String] = Map(
    "graph_kcore" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |thr AS (SELECT greatest(2, CAST(ceil(count(DISTINCT ok) * 13 / 1000000.0) AS BIGINT)) AS thr FROM li),
        |e0 AS (SELECT a.pk AS u, b.pk AS v
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY a.pk, b.pk HAVING count(*) >= (SELECT thr FROM thr)),
        |e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
        |v1 AS (SELECT u AS node_id FROM e GROUP BY u HAVING count(*) >= 2),
        |v2 AS (SELECT e.u AS node_id FROM e
        |       JOIN v1 a ON e.u = a.node_id JOIN v1 b ON e.v = b.node_id
        |       GROUP BY e.u HAVING count(*) >= 2),
        |v3 AS (SELECT e.u AS node_id FROM e
        |       JOIN v2 a ON e.u = a.node_id JOIN v2 b ON e.v = b.node_id
        |       GROUP BY e.u HAVING count(*) >= 2)
        |SELECT e.u AS node_id, count(*) AS deg FROM e
        |JOIN v3 a ON e.u = a.node_id JOIN v3 b ON e.v = b.node_id
        |GROUP BY e.u""".stripMargin
  )
}
