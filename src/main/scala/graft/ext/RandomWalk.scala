package graft.ext

import graft.Q
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic graph walk sampling — the corpus generator for
  * DeepWalk/node2vec-style embedding training (Perozzi et al., KDD'14):
  * from every source node, a `steps`-hop walk whose "random" neighbour
  * choice is the argmin of a PORTABLE hash md5(walk_id:step:candidate)
  * — uniformly scattering like a PRNG draw but exactly reproducible in
  * any engine (the md5-order discipline of `corpus_shuffle_order`), so
  * the emitted walk corpus is hash-oracle-checkable instead of
  * seed-and-pray. Changing the walk distribution = changing the hash
  * input (e.g. salting with a walk index for multiple walks per
  * source).
  *
  * 100 TB shape: each hop is ONE equi-join of the walk frontier
  * against the symmetric edge list on the current node plus one
  * map-side-combining struct-min per walk — the BFS round shape with
  * argmin instead of set-union, state is walk-count sized, no driver
  * involvement. Walks at sink nodes simply end (the inner join drops
  * them). Hop count is the lineage depth; long walks would adopt the
  * PageRank checkpoint discipline.
  */
object RandomWalk {

  /** (walk_id, step, node_id) rows for md5-argmin walks of `steps`
    * hops from each source over undirected `edges(u, v)`.
    */
  def deterministicWalks(edges: DataFrame, sources: DataFrame,
                         steps: Int): DataFrame = {
    require(steps >= 0, s"steps must be >= 0, got $steps")
    val und = edges.select(
        least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    // sym is probed once per hop, and each hop's state is read TWICE
    // (the next hop's join + the output union) — unpersisted, the state
    // chain re-evaluated 2^steps times (the PageRank-dangling lineage
    // class). Walk-count/edge-sized persists, released by the harness's
    // per-query clearCache.
    val sym = und.unionAll(und.select(col("v").as("u"), col("u").as("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var state = sources.select(col("node_id").as("walk_id"),
      col("node_id").as("cur"))
    var out = state.select(col("walk_id"), lit(0L).as("step"),
      col("cur").as("node_id"))
    for (step <- 1 to steps) {
      state = sym.join(state.withColumnRenamed("cur", "u"), "u")
        .select(col("walk_id"), col("v"),
          md5(concat_ws(":", col("walk_id"), lit(step), col("v"))).as("sc"))
        .groupBy(col("walk_id"))
        .agg(min(struct(col("sc"), col("v"))).as("top"))
        .select(col("walk_id"), col("top.v").as("cur"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out = out.unionByName(state.select(col("walk_id"),
        lit(step.toLong).as("step"), col("cur").as("node_id")))
    }
    out
  }

  val queries: Map[String, Q] = Map(
    // 4-hop md5-argmin walks from the low-id parts over the
    // support-floored co-purchase graph
    "graph_walk_sampling" -> ((s, dir) =>
      deterministicWalks(
        GraphOps.copurchaseEdges(s, dir),
        graft.Tables.part(s, dir)
          .where(col("p_partkey") < 100)
          .select(col("p_partkey").as("node_id")),
        steps = 4))
  )

  val oracleSql: Map[String, String] = Map(
    "graph_walk_sampling" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |thr AS (SELECT greatest(2, CAST(ceil(count(DISTINCT ok) * 13 / 1000000.0) AS BIGINT)) AS thr FROM li),
        |e AS (SELECT a.pk AS u, b.pk AS v
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY a.pk, b.pk HAVING count(*) >= (SELECT thr FROM thr)),
        |sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |w0 AS (SELECT p_partkey AS walk_id, p_partkey AS cur FROM part
        |       WHERE p_partkey < 100),
        |s1 AS (SELECT walk_id, v AS cur FROM (
        |         SELECT w.walk_id, s.v, row_number() OVER (PARTITION BY w.walk_id
        |             ORDER BY md5(CAST(w.walk_id AS VARCHAR) || ':1:' || CAST(s.v AS VARCHAR)), s.v) AS rn
        |         FROM w0 w JOIN sym s ON s.u = w.cur) t WHERE rn = 1),
        |s2 AS (SELECT walk_id, v AS cur FROM (
        |         SELECT w.walk_id, s.v, row_number() OVER (PARTITION BY w.walk_id
        |             ORDER BY md5(CAST(w.walk_id AS VARCHAR) || ':2:' || CAST(s.v AS VARCHAR)), s.v) AS rn
        |         FROM s1 w JOIN sym s ON s.u = w.cur) t WHERE rn = 1),
        |s3 AS (SELECT walk_id, v AS cur FROM (
        |         SELECT w.walk_id, s.v, row_number() OVER (PARTITION BY w.walk_id
        |             ORDER BY md5(CAST(w.walk_id AS VARCHAR) || ':3:' || CAST(s.v AS VARCHAR)), s.v) AS rn
        |         FROM s2 w JOIN sym s ON s.u = w.cur) t WHERE rn = 1),
        |s4 AS (SELECT walk_id, v AS cur FROM (
        |         SELECT w.walk_id, s.v, row_number() OVER (PARTITION BY w.walk_id
        |             ORDER BY md5(CAST(w.walk_id AS VARCHAR) || ':4:' || CAST(s.v AS VARCHAR)), s.v) AS rn
        |         FROM s3 w JOIN sym s ON s.u = w.cur) t WHERE rn = 1)
        |SELECT walk_id, CAST(0 AS BIGINT) AS step, cur AS node_id FROM w0
        |UNION ALL SELECT walk_id, 1, cur FROM s1
        |UNION ALL SELECT walk_id, 2, cur FROM s2
        |UNION ALL SELECT walk_id, 3, cur FROM s3
        |UNION ALL SELECT walk_id, 4, cur FROM s4""".stripMargin
  )
}
