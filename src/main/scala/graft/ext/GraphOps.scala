package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected edge list — the third graph
  * operator beside connected components (DedupCluster) and PageRank:
  * per-node triangle participation counts, exact.
  *
  * 100 TB shape — degree orientation (the MapReduce triangle-counting
  * scheme of Suri & Vassilvitskii, WWW'11): orient every undirected
  * edge from its (degree, id)-smaller endpoint to the larger one. The
  * oriented out-degree of ANY node is then O(√m), so the wedge join
  * (e1 ⋈ e2 on e1.dst = e2.src) fans out Σ outdeg² ≤ m^1.5 instead of
  * Σ deg² — unbounded for power-law hubs. A celebrity node with 10⁸
  * followers contributes ZERO wedges from its own out-list; its
  * triangles are found from its low-degree neighbours' lists. Three
  * hash shuffles total (degree count, wedge join, closing-edge join),
  * all on node/edge keys, no driver state.
  *
  * The triple set is orientation-independent (each triangle appears
  * exactly once as its (deg,id)-sorted corner chain), so per-node
  * counts equal the oracle's id-oriented brute force.
  */
object GraphOps {

  /** Per-node triangle counts over undirected `edges(u, v)` (any
    * orientation, self-loops and duplicates tolerated — canonicalized
    * internally). Returns (node_id, n_triangles) for nodes in ≥ 1
    * triangle.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // canonical undirected edge set: u < v, one row per edge
    val und = edges.select(
        least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val deg = und.select(col("u").as("node")).unionAll(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient by (deg, id): src is the (deg,id)-smaller endpoint
    val oriented = und
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("src"), col("v").as("dst")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    // wedges a→b→c close into triangles iff oriented edge a→c exists;
    // the closing join probes the edge set on its (src,dst) key
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
    val triangles = wedges
      .join(oriented.as("e3"),
        col("a") === col("e3.src") && col("c") === col("e3.dst"))
      .select(col("a"), col("b"), col("c"))
    triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("node_id"))
      .groupBy(col("node_id")).agg(count(lit(1)).as("n_triangles"))
  }

  val queries: Map[String, Q] = Map(
    // market-basket graph: parts co-purchased in the same order
    "graph_triangles" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      val edges = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("u"), col("b.pk").as("v"))
      triangleCounts(edges)
    })
  )

  val oracleSql: Map[String, String] = Map(
    // id-oriented brute force: each triangle found once as a < b < c
    "graph_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
        |t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |      FROM e e1 JOIN e e2 ON e2.u = e1.v
        |      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |corners AS (SELECT a AS node_id FROM t
        |            UNION ALL SELECT b FROM t
        |            UNION ALL SELECT c FROM t)
        |SELECT node_id, count(*) AS n_triangles FROM corners GROUP BY node_id""".stripMargin
  )
}
