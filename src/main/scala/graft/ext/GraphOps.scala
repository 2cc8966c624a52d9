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
    val (und, deg) = canonicalUndirected(edges)
    triangleCountsCore(und, deg)
  }

  /** Canonical undirected edge set (u < v, one row per edge) and the
    * node degree table, both PERSISTED: every consumer references them
    * 2-3× inside one plan (deg derives from und; the orientation join
    * probes both; clusteringCoefficients adds its own deg read), and an
    * unpersisted lineage re-runs the upstream edge construction — for
    * the co-purchase consumers a Σ|basket|² self-join — once per
    * reference (guide §5 persist-reused-frames; released by the
    * harness's per-query clearCache, the registry contract).
    */
  private def canonicalUndirected(edges: DataFrame): (DataFrame, DataFrame) = {
    val und = edges.select(
        least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = und.select(col("u").as("node")).unionAll(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (und, deg)
  }

  /** [[triangleCounts]] over an already-built (und, deg) pair. */
  private def triangleCountsCore(und: DataFrame, deg: DataFrame): DataFrame = {
    // orient by (deg, id): src is the (deg,id)-smaller endpoint
    val oriented = und
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("src"), col("v").as("dst")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      // referenced THREE times below (both wedge sides + the closing
      // probe) — persist so the orientation join runs once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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

  /** Single-source(-set) BFS hop distances over an UNDIRECTED edge
    * list: (node_id, dist) for every node within `maxHops` of a source,
    * dist = minimum hop count (sources get 0).
    *
    * 100 TB shape — synchronous frontier expansion, the Pregel scheme
    * as plain relational rounds: each round joins the CURRENT FRONTIER
    * (only the nodes first reached last round, never the full reached
    * set) against the edge list on the frontier key, then one
    * map-side-combining min-agg and an anti-join drop nodes already
    * reached. Work per round is proportional to the frontier's edge
    * fan-out — the join's small side is frontier-sized, so early
    * rounds broadcast and later rounds shuffle, chosen by Catalyst
    * stats per round. Lineage truncates via localCheckpoint every
    * [[GraphOps.CheckpointEvery]] rounds (the PageRank discipline) so
    * plan depth stays bounded for deep traversals. No driver-side
    * graph state; the reached set is only ever unioned, never
    * collected.
    */
  def bfsLayers(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame =
    bfsLayersStamped(edges, sources, maxHops)._1

  private val CheckpointEvery = 5

  /** [[bfsLayers]] plus the thunk releasing the persisted frames. */
  def bfsLayersStamped(edges: DataFrame, sources: DataFrame,
                       maxHops: Int): (DataFrame, () => Unit) = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val sym = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val handles = scala.collection.mutable.ArrayBuffer[DataFrame](sym)
    var reached = sources.select(col("node_id")).distinct()
      .withColumn("dist", lit(0L))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    handles += reached
    var frontier = reached
    var hop = 1
    while (hop <= maxHops) {
      val next = sym.join(frontier.withColumnRenamed("node_id", "u"), "u")
        .select(col("v").as("node_id"))
        .distinct()
        .join(reached.select(col("node_id")), Seq("node_id"), "left_anti")
        .withColumn("dist", lit(hop.toLong))
      val nextP = (if (hop % CheckpointEvery == 0) next.localCheckpoint(false) else next)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      handles += nextP
      reached = reached.unionByName(nextP)
      frontier = nextP
      hop += 1
    }
    (reached, () => { handles.foreach(_.unpersist()); () })
  }

  /** Batched multi-source BFS — [[bfsLayers]] keyed by SOURCE: every
    * seed runs its own frontier expansion in the same jobs, giving the
    * per-source hop-distance table (src, node_id, dist) that backs
    * eccentricity estimates, landmark distances, and k-source
    * reachability — the all-pairs-lite building block. Each round is
    * one edge-keyed equi-join + a (src, node) anti-join against the
    * reached set; the per-round state is k × reachable rows, so k is
    * the scale dial (landmark counts, not corpus size). Same
    * persist/checkpoint discipline as the single-set BFS.
    */
  def multiSourceBfsStamped(edges: DataFrame, sources: DataFrame,
                            maxHops: Int): (DataFrame, () => Unit) = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val sym = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val handles = scala.collection.mutable.ArrayBuffer[DataFrame](sym)
    var reached = sources.select(col("src")).distinct()
      .select(col("src"), col("src").as("node_id"), lit(0L).as("dist"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    handles += reached
    var frontier = reached
    var hop = 1
    while (hop <= maxHops) {
      val next = sym.join(frontier.withColumnRenamed("node_id", "u"), "u")
        .select(col("src"), col("v").as("node_id"))
        .distinct()
        .join(reached.select(col("src"), col("node_id")),
          Seq("src", "node_id"), "left_anti")
        .withColumn("dist", lit(hop.toLong))
      val nextP = (if (hop % CheckpointEvery == 0) next.localCheckpoint(false) else next)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      handles += nextP
      reached = reached.unionByName(nextP)
      frontier = nextP
      hop += 1
    }
    (reached, () => { handles.foreach(_.unpersist()); () })
  }

  /** Per-node local clustering coefficient over the same canonical
    * undirected graph as [[triangleCounts]]: for every node of degree
    * ≥ 2, `lcc = 2·T(v) / (deg(v)·(deg(v)−1))`, emitted integer-scaled
    * (×10⁶, floor division — engine-exact) alongside the raw degree
    * and triangle count. Nodes in no triangle report 0, so the output
    * covers the full deg ≥ 2 node set — the shape community-quality
    * audits want. Cost on top of [[triangleCounts]] is one degree
    * aggregate and one left join keyed on node id.
    */
  def clusteringCoefficients(edges: DataFrame): DataFrame = {
    // ONE canonical (und, deg) build shared with the triangle chain —
    // the old form built its own und+deg AND had triangleCounts rebuild
    // both from `edges`, re-running the upstream edge construction
    val (und, deg0) = canonicalUndirected(edges)
    val deg = deg0.withColumnRenamed("node", "node_id")
    deg.where(col("deg") >= 2)
      .join(triangleCountsCore(und, deg0), Seq("node_id"), "left")
      .select(col("node_id"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("lcc_x1e6",
        expr("(2000000 * n_triangles) div (deg * (deg - 1))"))
  }

  /** Synchronous label-propagation communities over an undirected edge
    * list: `rounds` fixed synchronized rounds, each node adopting the
    * most frequent label among its NEIGHBORS (ties broken by the
    * smallest label — the deterministic variant of Raghavan et al.'s
    * LPA, whose async random tie-breaks would be unverifiable). Initial
    * label = node id. Returns (node_id, community) for every node of
    * the edge list.
    *
    * 100 TB shape — each round is one join keyed on the edge's
    * neighbor endpoint plus one map-side-combining (node,label) count
    * and one per-node argmax (min over struct(-cnt, label) — integer
    * exact, no window): work per round is O(m) shuffled on node keys,
    * no driver state, same fixed-round discipline as [[bfsLayers]]
    * (fixed synchronized rounds are also what makes the result
    * well-defined — async LPA is order-dependent). Plan depth grows
    * linearly with `rounds`; callers going deep should checkpoint as
    * PageRank does, but community detection converges in a handful of
    * sweeps — 3 rounds is the conventional budget.
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    // referenced once per round + the node init — persist so the
    // symmetrize/distinct (and the upstream edge build) run once, the
    // bfsLayersStamped discipline this loop predates
    val sym = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("u").as("node_id")).distinct()
      .withColumn("lbl", col("node_id"))
    for (_ <- 1 to rounds) {
      labels = sym
        .join(labels.select(col("node_id").as("v"), col("lbl")), "v")
        .groupBy(col("u"), col("lbl")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("u"))
        .agg(min(struct((-col("cnt")).as("neg"), col("lbl").as("l"))).as("top"))
        .select(col("u").as("node_id"), col("top.l").as("lbl"))
    }
    labels.select(col("node_id"), col("lbl").as("community"))
  }

  /** WEIGHTED synchronous LPA: identical round structure to
    * [[labelPropagation]], but each node adopts the label with the
    * largest TOTAL EDGE WEIGHT among its neighbors (smallest label on
    * ties) — on a support-weighted co-purchase graph, a node follows
    * the community it is most strongly bought-with, not merely the one
    * with the most distinct neighbors. Weights are non-negative longs,
    * so the argmax (`min(struct(-wsum, lbl))`) stays integer-exact.
    * Same per-round cost: one edge-keyed join + one map-side-combining
    * (node, label) SUM + one struct-min.
    */
  def labelPropagationWeighted(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    // persisted for the same reason as [[labelPropagation]]'s sym
    val sym = edges.select(col("u"), col("v"), col("w"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v"), col("w")))
      .where(col("u") =!= col("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("u").as("node_id")).distinct()
      .withColumn("lbl", col("node_id"))
    for (_ <- 1 to rounds) {
      labels = sym
        .join(labels.select(col("node_id").as("v"), col("lbl")), "v")
        .groupBy(col("u"), col("lbl")).agg(sum(col("w")).as("wsum"))
        .groupBy(col("u"))
        .agg(min(struct((-col("wsum")).as("neg"), col("lbl").as("l"))).as("top"))
        .select(col("u").as("node_id"), col("top.l").as("lbl"))
    }
    labels.select(col("node_id"), col("lbl").as("community"))
  }

  /** Integer-scaled Newman modularity of a `(node_id, community)`
    * labeling over the undirected edge list (`(u, v)`, each edge once,
    * u < v) — "are the communities any good" as one exact number per
    * community:
    *
    *   q_x1e9(c) = e_in(c)·S div m  −  deg_sum(c)²·S div (4·m²),  S = 1e9
    *
    * whose sum over communities is the integer-scaled modularity Q.
    * Floor division per community makes the value engine-reproducible;
    * long arithmetic is safe while deg_sum < ~96k (√(2⁶³/S)), which the
    * support-floored co-purchase graph satisfies at any corpus scale by
    * construction (≈3.5k edges measured at every probe scale).
    *
    * Plan shape: two label equi-joins on the edge endpoints (labels are
    * node-sized), one map-side-combining count per community, and the
    * edge total as a 1-row cross join — no collect, nothing data-sized
    * on the driver.
    */
  def communityModularity(edges: DataFrame, labels: DataFrame,
                          scale: Long = 1000000000L): DataFrame = {
    val e = edges.select(col("u"), col("v"))
    val m = e.agg(count(lit(1)).as("m"))
    val deg = e.select(col("u").as("node_id"))
      .unionAll(e.select(col("v").as("node_id")))
      .groupBy(col("node_id")).agg(count(lit(1)).as("deg"))
    val lbl = labels.select(col("node_id"), col("community"))
    val eIn = e
      .join(lbl.select(col("node_id").as("u"), col("community").as("cu")), "u")
      .join(lbl.select(col("node_id").as("v"), col("community").as("cv")), "v")
      .where(col("cu") === col("cv"))
      .groupBy(col("cu").as("community")).agg(count(lit(1)).as("e_in"))
    deg.join(lbl, "node_id")
      .groupBy(col("community"))
      .agg(sum(col("deg")).as("deg_sum"), count(lit(1)).as("n_nodes"))
      .join(eIn, Seq("community"), "left")
      .crossJoin(broadcast(m)) // 1-row scalar — pinned broadcast, never data-sized
      .select(col("community"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("deg_sum"),
        (expr(s"coalesce(e_in, 0L) * ${scale}L div m") -
          expr(s"deg_sum * deg_sum * ${scale}L div (4 * m * m)")).as("q_x1e9"))
  }

  /** Per-edge triangle SUPPORT — the k-truss building block (Cohen
    * 2008): support(u,v) = |Γ(u) ∩ Γ(v)|, and an edge belongs to the
    * 3-truss iff its support ≥ 1.
    *
    * 100 TB shape — the [[triangleCounts]] discipline, not per-edge
    * wedge fan-out: orient every edge from its (deg, id)-smaller
    * endpoint (Suri & Vassilvitskii, WWW'11), enumerate each triangle
    * EXACTLY ONCE via the oriented wedge + closing equi-join (fan-out
    * Σ outdeg² ≤ m^1.5, hub-proof), then credit each triangle's three
    * canonical edges with one explode + map-side-combining count.
    * Support is orientation-independent, so the result matches the
    * oracle's id-oriented brute force. Zero-support edges survive via
    * the left join — they are the 3-truss REJECTS, which is the point.
    */
  def edgeSupport(edges: DataFrame): DataFrame = {
    // shared persisted (und, deg) + persisted orientation, as in
    // [[triangleCountsCore]] — und is additionally the left side of the
    // final support join
    val (und, deg) = canonicalUndirected(edges)
    val oriented = und
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("src"), col("v").as("dst")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
    val triangles = wedges
      .join(oriented.as("e3"),
        col("a") === col("e3.src") && col("c") === col("e3.dst"))
      .select(col("a"), col("b"), col("c"))
    // each triangle credits its three edges in canonical (min, max) form
    val closed = triangles
      .select(explode(array(
        struct(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v")),
        struct(least(col("a"), col("c")).as("u"), greatest(col("a"), col("c")).as("v")),
        struct(least(col("b"), col("c")).as("u"), greatest(col("b"), col("c")).as("v"))
      )).as("e"))
      .groupBy(col("e.u").as("u"), col("e.v").as("v"))
      .agg(count(lit(1)).as("support"))
    und.join(closed, Seq("u", "v"), "left")
      .select(col("u"), col("v"),
        coalesce(col("support"), lit(0L)).as("support"))
      .withColumn("in_3truss", col("support") >= 1L)
  }

  /** Per-community CONDUCTANCE of a labeling — the boundary-quality
    * complement to [[communityModularity]]: φ(S) = cut(S) / min(vol(S),
    * 2m − vol(S)), where the identity vol(S) = 2·e_in + cut means the
    * cut needs NO extra join — both quantities fall out of the same
    * per-community (e_in, deg_sum) aggregates, so the whole readout
    * costs exactly what modularity costs. Integer ppm, truncating divs
    * on both engines, greatest-guard for the isolated-community
    * denominator (vol = 2m makes the min 0).
    */
  def communityConductance(edges: DataFrame, labels: DataFrame,
                           scale: Long = 1000000L): DataFrame = {
    val e = edges.select(col("u"), col("v"))
    val m = e.agg(count(lit(1)).as("m"))
    val deg = e.select(col("u").as("node_id"))
      .unionAll(e.select(col("v").as("node_id")))
      .groupBy(col("node_id")).agg(count(lit(1)).as("deg"))
    val lbl = labels.select(col("node_id"), col("community"))
    val eIn = e
      .join(lbl.select(col("node_id").as("u"), col("community").as("cu")), "u")
      .join(lbl.select(col("node_id").as("v"), col("community").as("cv")), "v")
      .where(col("cu") === col("cv"))
      .groupBy(col("cu").as("community")).agg(count(lit(1)).as("e_in"))
    deg.join(lbl, "node_id")
      .groupBy(col("community"))
      .agg(sum(col("deg")).as("deg_sum"), count(lit(1)).as("n_nodes"))
      .join(eIn, Seq("community"), "left")
      .crossJoin(broadcast(m)) // 1-row scalar — pinned broadcast, never data-sized
      .select(col("community"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("deg_sum"),
        (col("deg_sum") - lit(2L) * coalesce(col("e_in"), lit(0L))).as("cut"),
        expr(s"""(deg_sum - 2 * coalesce(e_in, 0L)) * ${scale}L
               div greatest(least(deg_sum, 2 * m - deg_sum), 1L)""")
          .as("conductance_ppm"))
  }

  /** Hop-bounded weighted single-source(-set) shortest paths —
    * Bellman-Ford as synchronous min-plus relaxation rounds, the
    * weighted counterpart of [[bfsLayers]]: after `rounds` rounds,
    * `dist(v)` = the minimum total weight over paths of ≤ `rounds`
    * edges from any source (sources at 0). Undirected; weights must be
    * non-negative integers (exact arithmetic end to end).
    *
    * 100 TB shape — each round is one join of the CURRENT dist table
    * against the edge list on the edge key plus one map-side-combining
    * min-agg; no per-node priority queue (Dijkstra is inherently
    * sequential), no driver state. Work per round is O(m). The
    * hop bound is the contract, not a truncation: "reachable within k
    * legs" is itself the business question (fraud rings, delivery
    * legs), and it is what makes the result oracle-checkable by k
    * unrolled CTE rounds.
    */
  def ssspBounded(edges: DataFrame, sources: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    // sym is probed once per round; dist is referenced TWICE per round
    // (the relax join + the union), so an unpersisted chain re-evaluates
    // round r-1 twice from scratch — 2^rounds recompute of the base, the
    // Preference-fit lineage lesson. Persist both; released by the
    // harness's per-query clearCache (the registry contract).
    val sym = edges.select(col("u"), col("v"), col("w"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v"), col("w")))
      .where(col("u") =!= col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var dist = sources.select(col("node_id")).distinct()
      .withColumn("dist", lit(0L))
    for (_ <- 1 to rounds) {
      val relaxed = sym
        .join(dist.select(col("node_id").as("u"), col("dist")), "u")
        .select(col("v").as("node_id"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy(col("node_id")).agg(min(col("dist")).as("dist"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    dist
  }

  /** Support-thresholded co-purchase graph: an edge per part pair seen
    * together in ≥ max(2, ceil(13 ppm of distinct orders)) DISTINCT
    * orders. The floor is what keeps the graph analyzable at any scale:
    * raw single-co-occurrence edges grow with Σ basket² (1.2M at sf0.1,
    * measured) and are noise for market-basket purposes — the same
    * reason association-rule miners take a support floor first. The
    * floor is RELATIVE (a fraction of baskets, clamped below by 2), not
    * absolute: co-occurrence counts grow linearly with order count, so
    * a fixed "≥ 2" floor re-admits the dense noise graph at larger
    * corpora — measured by the 10× probe as a 26× runtime ratio before
    * this fix, and restored to a near-constant edge set (≈3.5k at every
    * scale) by it. The threshold is a 1-row broadcast (no collect); the
    * support count is one extra map-side-combining aggregate on the
    * already-shuffled pair key.
    */
  private[ext] def copurchaseEdges(s: org.apache.spark.sql.SparkSession, dir: String,
                              supportPpm: Int = 13): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      // referenced 3× (threshold aggregate + both self-join sides)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val thr = li.agg(countDistinct(col("ok")).as("n_orders"))
      .select(greatest(lit(2L),
        ceil(col("n_orders") * supportPpm / lit(1000000.0)).cast("long")).as("thr"))
    li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
      .agg(count(lit(1)).as("sup"))
      .crossJoin(broadcast(thr))
      .where(col("sup") >= col("thr"))
      .select(col("u"), col("v"), col("sup"))
      // every consumer references the projection 2-7× inside one plan
      // (symmetrize + degree + per-round joins); unpersisted, each
      // reference re-ran the Σ|basket|² self-join + pair aggregate —
      // the support-floored edge set is ≈3.5k rows at every scale
      // (scale-constant by the relative floor), so the persist is
      // near-free at 100 TB too. Released by the harness's per-query
      // clearCache (the registry contract).
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Degree assortativity (Newman 2002) — "do high-degree nodes link
    * to high-degree nodes?", the one-number mixing summary that
    * separates social-style graphs (assortative, r > 0) from
    * hub-and-spoke infrastructure (disassortative, r < 0). Over the
    * SYMMETRIZED directed edge list the two endpoint marginals are
    * identical, so Pearson-across-edges collapses to ONE exact integer
    * rational:
    *
    *   r = (M·Σdᵤdᵥ − (Σdᵤ)²) / (M·Σdᵤ² − (Σdᵤ)²)
    *
    * (M = directed edge count). A degree-regular graph zeroes the
    * denominator — pinned NULL on both engines. Products ride
    * decimal(38,0): M·Σd² ≈ M²·d_max² passes 38 digits near 10⁸
    * directed edges at 10³ max degree.
    *
    * 100 TB shape: one degree aggregate, two keyed joins of the
    * node-sized degree table onto the edge list, one map-side-combined
    * moment aggregate to a single row.
    */
  def assortativity(edges: DataFrame): DataFrame = {
    // referenced by the degree aggregate AND as the join probe side
    val sym = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
    sym
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .agg(count(lit(1)).as("n_directed"),
        sum(col("du")).as("sum_deg"),
        sum(expr("CAST(du AS DECIMAL(38,0)) * dv")).as("_sxy"),
        sum(expr("CAST(du AS DECIMAL(38,0)) * du")).as("_sx2"))
      .withColumn("_den", expr(
        """CAST(n_directed AS DECIMAL(38,0)) * _sx2
          | - CAST(sum_deg AS DECIMAL(38,0)) * sum_deg""".stripMargin))
      .select(col("n_directed"), col("sum_deg"),
        expr("CAST(_sxy AS BIGINT)").as("sum_deg_prod"),
        expr("CAST(_sx2 AS BIGINT)").as("sum_deg_sq"),
        expr("""CASE WHEN _den = 0 THEN CAST(NULL AS BIGINT)
               ELSE CAST((CAST(n_directed AS DECIMAL(38,0)) * _sxy
                 - CAST(sum_deg AS DECIMAL(38,0)) * sum_deg) * 1000000
                 div _den AS BIGINT) END""").as("assort_ppm"))
  }

  val queries: Map[String, Q] = Map(
    // degree-mixing summary of the co-purchase graph (one integer
    // rational; NULL on degree-regular graphs by the kappa guard)
    "graph_assortativity" -> ((s, dir) =>
      assortativity(copurchaseEdges(s, dir))),

    // The bipartite→unipartite projection ITSELF as a first-class
    // operator (every other graph query consumes it): order–part
    // incidence → support-weighted part–part edges, support-floored
    // relative to order count so graph density is scale-constant. One
    // self-join on the order key + one pair aggregate; the floor is a
    // 1-row broadcast.
    "graph_bipartite_projection" -> ((s, dir) => copurchaseEdges(s, dir)),

    // market-basket graph: relative-support-floored co-purchases
    "graph_triangles" -> ((s, dir) =>
      triangleCounts(copurchaseEdges(s, dir))),

    // 2-hop BFS over the same co-purchase graph from the low-id parts
    "graph_bfs_layers" -> ((s, dir) =>
      bfsLayers(
        copurchaseEdges(s, dir),
        Tables.part(s, dir)
          .where(col("p_partkey") < 100)
          .select(col("p_partkey").as("node_id")),
        maxHops = 2)),

    // batched multi-source BFS: 8 md5-chosen landmark parts, per-source
    // 2-hop distance table (the landmark-distance building block)
    "graph_multi_source_bfs" -> ((s, dir) => {
      val seeds = Tables.part(s, dir)
        .orderBy(md5(col("p_partkey").cast("string")), col("p_partkey"))
        .limit(8)
        .select(col("p_partkey").cast("long").as("src"))
      multiSourceBfsStamped(copurchaseEdges(s, dir), seeds, maxHops = 2)._1
    }),

    // landmark reachability/eccentricity rollup of the multi-source
    // BFS: per landmark, how much of the graph is within 2 hops and
    // the observed max distance (an eccentricity LOWER bound at this
    // hop budget — the landmark diameter estimator's input)
    "graph_landmark_ecc" -> ((s, dir) => {
      val seeds = Tables.part(s, dir)
        .orderBy(md5(col("p_partkey").cast("string")), col("p_partkey"))
        .limit(8)
        .select(col("p_partkey").cast("long").as("src"))
      multiSourceBfsStamped(copurchaseEdges(s, dir), seeds, maxHops = 2)._1
        .groupBy(col("src"))
        .agg(count(lit(1)).as("n_reached"),
          max(col("dist")).as("ecc_at_2"))
    }),

    // harmonic centrality (hop-budgeted) per landmark: Σ 1/dist over
    // reached nodes as an exact integer ×1e6 — the centrality variant
    // that handles disconnection natively (unreached nodes contribute
    // 0, no infinite closeness denominators). Same frontier chain as
    // the eccentricity rollup, one different final aggregate.
    "graph_harmonic_landmarks" -> ((s, dir) => {
      val seeds = Tables.part(s, dir)
        .orderBy(md5(col("p_partkey").cast("string")), col("p_partkey"))
        .limit(8)
        .select(col("p_partkey").cast("long").as("src"))
      multiSourceBfsStamped(copurchaseEdges(s, dir), seeds, maxHops = 2)._1
        .groupBy(col("src"))
        .agg(sum(when(col("dist") > 0, lit(1L)).otherwise(0L)).as("n_reached"),
          sum(when(col("dist") > 0, expr("1000000 div dist")).otherwise(0L))
            .as("harmonic_x1e6"))
    }),

    // 3-round deterministic LPA communities over the same graph
    "graph_label_propagation" -> ((s, dir) =>
      labelPropagation(copurchaseEdges(s, dir), rounds = 3)),

    // integer-scaled local clustering coefficients, deg >= 2 nodes
    "graph_clustering_coeff" -> ((s, dir) =>
      clusteringCoefficients(copurchaseEdges(s, dir))),

    // per-community integer-scaled modularity of the 3-round LPA
    // labeling — the quality loop-closer on graph_label_propagation
    "graph_modularity" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      // the label table is referenced twice by the finisher (both edge
      // endpoints) — unpersisted, the whole 3-round LPA re-ran per
      // reference
      val labels = labelPropagation(edges, rounds = 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      communityModularity(edges, labels)
    }),

    // per-edge triangle support + the 3-truss membership flag over
    // the same support-floored graph
    "graph_edge_support" -> ((s, dir) =>
      edgeSupport(copurchaseEdges(s, dir))),

    // boundary quality of the same LPA communities — modularity's
    // complement, from the identical per-community aggregates
    "graph_community_conductance" -> ((s, dir) => {
      val edges = copurchaseEdges(s, dir)
      // persisted for the same reason as graph_modularity's labels
      val labels = labelPropagation(edges, rounds = 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      communityConductance(edges, labels)
    }),

    // support-weighted LPA over the same graph (w = co-purchase count)
    "graph_label_propagation_weighted" -> ((s, dir) =>
      labelPropagationWeighted(
        copurchaseEdges(s, dir).withColumn("w", col("sup")), rounds = 3)),

    // 3-leg weighted shortest paths; stronger co-purchase = shorter
    // edge (w = 1e6 div support), integer min-plus relaxation
    "graph_sssp_weighted" -> ((s, dir) =>
      ssspBounded(
        copurchaseEdges(s, dir).withColumn("w", expr("1000000 div sup")),
        Tables.part(s, dir)
          .where(col("p_partkey") < 100)
          .select(col("p_partkey").as("node_id")),
        rounds = 3))
  )

  val oracleSql: Map[String, String] = Map(
    "graph_assortativity" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |thr AS (SELECT greatest(2, CAST(ceil(count(DISTINCT ok) * 13 / 1000000.0) AS BIGINT)) AS thr FROM li),
        |e0 AS (SELECT a.pk AS u, b.pk AS v
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY a.pk, b.pk HAVING count(*) >= (SELECT thr FROM thr)),
        |sym AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        |deg AS (SELECT u AS node, count(*) AS deg FROM sym GROUP BY u),
        |m AS (
        |  SELECT count(*) AS n_directed,
        |    CAST(sum(du.deg) AS BIGINT) AS sum_deg,
        |    sum(CAST(du.deg AS HUGEINT) * dv.deg) AS sxy,
        |    sum(CAST(du.deg AS HUGEINT) * du.deg) AS sx2
        |  FROM sym JOIN deg du ON du.node = sym.u
        |           JOIN deg dv ON dv.node = sym.v),
        |d AS (
        |  SELECT *, CAST(n_directed AS HUGEINT) * sx2
        |    - CAST(sum_deg AS HUGEINT) * sum_deg AS den
        |  FROM m)
        |SELECT CAST(n_directed AS BIGINT) AS n_directed, sum_deg,
        |  CAST(sxy AS BIGINT) AS sum_deg_prod,
        |  CAST(sx2 AS BIGINT) AS sum_deg_sq,
        |  CASE WHEN den = 0 THEN NULL
        |  ELSE CAST((CAST(n_directed AS HUGEINT) * sxy
        |    - CAST(sum_deg AS HUGEINT) * sum_deg) * 1000000 // den AS BIGINT)
        |  END AS assort_ppm
        |FROM d""".stripMargin,

    "graph_bipartite_projection" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |thr AS (SELECT greatest(2, CAST(ceil(count(DISTINCT ok) * 13 / 1000000.0) AS BIGINT)) AS thr FROM li)
        |SELECT a.pk AS u, b.pk AS v, count(*) AS sup
        |FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |GROUP BY a.pk, b.pk HAVING count(*) >= (SELECT thr FROM thr)""".stripMargin,

    // id-oriented brute force: each triangle found once as a < b < c
    "graph_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |thr AS (SELECT greatest(2, CAST(ceil(count(DISTINCT ok) * 13 / 1000000.0) AS BIGINT)) AS thr FROM li),
        |e AS (SELECT a.pk AS u, b.pk AS v
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY a.pk, b.pk HAVING count(*) >= (SELECT thr FROM thr)),
        |t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |      FROM e e1 JOIN e e2 ON e2.u = e1.v
        |      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |corners AS (SELECT a AS node_id FROM t
        |            UNION ALL SELECT b FROM t
        |            UNION ALL SELECT c FROM t)
        |SELECT node_id, count(*) AS n_triangles FROM corners GROUP BY node_id""".stripMargin,

    // unrolled frontier rounds: f1 = N(r0) \ r0, f2 = N(f1) \ (r0 ∪ f1)
    "graph_bfs_layers" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |thr AS (SELECT greatest(2, CAST(ceil(count(DISTINCT ok) * 13 / 1000000.0) AS BIGINT)) AS thr FROM li),
        |e0 AS (SELECT a.pk AS u, b.pk AS v
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY a.pk, b.pk HAVING count(*) >= (SELECT thr FROM thr)),
        |e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
        |r0 AS (SELECT p_partkey AS node_id FROM part WHERE p_partkey < 100),
        |f1 AS (SELECT DISTINCT e.v AS node_id FROM e JOIN r0 ON e.u = r0.node_id
        |       WHERE e.v NOT IN (SELECT node_id FROM r0)),
        |f2 AS (SELECT DISTINCT e.v AS node_id FROM e JOIN f1 ON e.u = f1.node_id
        |       WHERE e.v NOT IN (SELECT node_id FROM r0)
        |         AND e.v NOT IN (SELECT node_id FROM f1))
        |SELECT node_id, CAST(0 AS BIGINT) AS dist FROM r0
        |UNION ALL SELECT node_id, 1 FROM f1
        |UNION ALL SELECT node_id, 2 FROM f2""".stripMargin,

    // per-source unrolled frontiers over the same support-floored graph;
    // dedup keyed by (src, node) via NOT EXISTS — the Spark anti-join
    "graph_multi_source_bfs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |thr AS (SELECT greatest(2, CAST(ceil(count(DISTINCT ok) * 13 / 1000000.0) AS BIGINT)) AS thr FROM li),
        |e0 AS (SELECT a.pk AS u, b.pk AS v
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY a.pk, b.pk HAVING count(*) >= (SELECT thr FROM thr)),
        |e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
        |s AS (SELECT CAST(p_partkey AS BIGINT) AS src FROM part
        |      ORDER BY md5(CAST(p_partkey AS VARCHAR)), p_partkey LIMIT 8),
        |d0 AS (SELECT src, src AS node_id FROM s),
        |n1 AS (SELECT DISTINCT d.src, e.v AS node_id
        |       FROM e JOIN d0 d ON e.u = d.node_id
        |       WHERE NOT EXISTS (SELECT 1 FROM d0 x
        |         WHERE x.src = d.src AND x.node_id = e.v)),
        |n2 AS (SELECT DISTINCT n.src, e.v AS node_id
        |       FROM e JOIN n1 n ON e.u = n.node_id
        |       WHERE NOT EXISTS (SELECT 1 FROM d0 x
        |         WHERE x.src = n.src AND x.node_id = e.v)
        |         AND NOT EXISTS (SELECT 1 FROM n1 y
        |         WHERE y.src = n.src AND y.node_id = e.v))
        |SELECT src, node_id, CAST(0 AS BIGINT) AS dist FROM d0
        |UNION ALL SELECT src, node_id, 1 FROM n1
        |UNION ALL SELECT src, node_id, 2 FROM n2""".stripMargin,

    // the same per-source frontier chain, rolled up per landmark
    "graph_landmark_ecc" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |thr AS (SELECT greatest(2, CAST(ceil(count(DISTINCT ok) * 13 / 1000000.0) AS BIGINT)) AS thr FROM li),
        |e0 AS (SELECT a.pk AS u, b.pk AS v
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY a.pk, b.pk HAVING count(*) >= (SELECT thr FROM thr)),
        |e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
        |s AS (SELECT CAST(p_partkey AS BIGINT) AS src FROM part
        |      ORDER BY md5(CAST(p_partkey AS VARCHAR)), p_partkey LIMIT 8),
        |d0 AS (SELECT src, src AS node_id FROM s),
        |n1 AS (SELECT DISTINCT d.src, e.v AS node_id
        |       FROM e JOIN d0 d ON e.u = d.node_id
        |       WHERE NOT EXISTS (SELECT 1 FROM d0 x
        |         WHERE x.src = d.src AND x.node_id = e.v)),
        |n2 AS (SELECT DISTINCT n.src, e.v AS node_id
        |       FROM e JOIN n1 n ON e.u = n.node_id
        |       WHERE NOT EXISTS (SELECT 1 FROM d0 x
        |         WHERE x.src = n.src AND x.node_id = e.v)
        |         AND NOT EXISTS (SELECT 1 FROM n1 y
        |         WHERE y.src = n.src AND y.node_id = e.v)),
        |all_d AS (
        |  SELECT src, node_id, CAST(0 AS BIGINT) AS dist FROM d0
        |  UNION ALL SELECT src, node_id, 1 FROM n1
        |  UNION ALL SELECT src, node_id, 2 FROM n2)
        |SELECT src, count(*) AS n_reached,
        |  CAST(max(dist) AS BIGINT) AS ecc_at_2
        |FROM all_d GROUP BY src""".stripMargin,

    // same frontier chain, harmonic rollup (Σ 1e6 // dist, dist > 0)
    "graph_harmonic_landmarks" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |thr AS (SELECT greatest(2, CAST(ceil(count(DISTINCT ok) * 13 / 1000000.0) AS BIGINT)) AS thr FROM li),
        |e0 AS (SELECT a.pk AS u, b.pk AS v
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY a.pk, b.pk HAVING count(*) >= (SELECT thr FROM thr)),
        |e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
        |s AS (SELECT CAST(p_partkey AS BIGINT) AS src FROM part
        |      ORDER BY md5(CAST(p_partkey AS VARCHAR)), p_partkey LIMIT 8),
        |d0 AS (SELECT src, src AS node_id FROM s),
        |n1 AS (SELECT DISTINCT d.src, e.v AS node_id
        |       FROM e JOIN d0 d ON e.u = d.node_id
        |       WHERE NOT EXISTS (SELECT 1 FROM d0 x
        |         WHERE x.src = d.src AND x.node_id = e.v)),
        |n2 AS (SELECT DISTINCT n.src, e.v AS node_id
        |       FROM e JOIN n1 n ON e.u = n.node_id
        |       WHERE NOT EXISTS (SELECT 1 FROM d0 x
        |         WHERE x.src = n.src AND x.node_id = e.v)
        |         AND NOT EXISTS (SELECT 1 FROM n1 y
        |         WHERE y.src = n.src AND y.node_id = e.v)),
        |all_d AS (
        |  SELECT src, node_id, CAST(0 AS BIGINT) AS dist FROM d0
        |  UNION ALL SELECT src, node_id, 1 FROM n1
        |  UNION ALL SELECT src, node_id, 2 FROM n2)
        |SELECT src,
        |  CAST(sum(CASE WHEN dist > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_reached,
        |  CAST(sum(CASE WHEN dist > 0 THEN 1000000 // dist ELSE 0 END) AS BIGINT) AS harmonic_x1e6
        |FROM all_d GROUP BY src""".stripMargin,

    // 3 unrolled synchronized rounds; per-node argmax = row_number over
    // (count DESC, label ASC) — the same (most-frequent, then smallest)
    // tie-break as the Spark side's min(struct(-cnt, lbl))
    "graph_label_propagation" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |thr AS (SELECT greatest(2, CAST(ceil(count(DISTINCT ok) * 13 / 1000000.0) AS BIGINT)) AS thr FROM li),
        |e0 AS (SELECT a.pk AS u, b.pk AS v
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY a.pk, b.pk HAVING count(*) >= (SELECT thr FROM thr)),
        |e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
        |l0 AS (SELECT DISTINCT u AS node_id, u AS lbl FROM e),
        |r1 AS (SELECT e.u, l.lbl, count(*) AS c FROM e JOIN l0 l ON e.v = l.node_id GROUP BY e.u, l.lbl),
        |l1 AS (SELECT u AS node_id, lbl FROM (
        |  SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u ORDER BY c DESC, lbl) AS rn FROM r1) WHERE rn = 1),
        |r2 AS (SELECT e.u, l.lbl, count(*) AS c FROM e JOIN l1 l ON e.v = l.node_id GROUP BY e.u, l.lbl),
        |l2 AS (SELECT u AS node_id, lbl FROM (
        |  SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u ORDER BY c DESC, lbl) AS rn FROM r2) WHERE rn = 1),
        |r3 AS (SELECT e.u, l.lbl, count(*) AS c FROM e JOIN l2 l ON e.v = l.node_id GROUP BY e.u, l.lbl),
        |l3 AS (SELECT u AS node_id, lbl FROM (
        |  SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u ORDER BY c DESC, lbl) AS rn FROM r3) WHERE rn = 1)
        |SELECT node_id, lbl AS community FROM l3""".stripMargin,

    // the weighted rounds: sum(w) replaces count, argmax = row_number
    // over (wsum DESC, lbl) — the same tie-break as min(struct(-wsum, lbl))
    "graph_label_propagation_weighted" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |thr AS (SELECT greatest(2, CAST(ceil(count(DISTINCT ok) * 13 / 1000000.0) AS BIGINT)) AS thr FROM li),
        |e0 AS (SELECT a.pk AS u, b.pk AS v, count(*) AS sup
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY a.pk, b.pk HAVING count(*) >= (SELECT thr FROM thr)),
        |e AS (SELECT u, v, sup AS w FROM e0 UNION SELECT v, u, sup FROM e0),
        |l0 AS (SELECT DISTINCT u AS node_id, u AS lbl FROM e),
        |r1 AS (SELECT e.u, l.lbl, CAST(sum(e.w) AS BIGINT) AS ws FROM e JOIN l0 l ON e.v = l.node_id GROUP BY e.u, l.lbl),
        |l1 AS (SELECT u AS node_id, lbl FROM (
        |  SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u ORDER BY ws DESC, lbl) AS rn FROM r1) WHERE rn = 1),
        |r2 AS (SELECT e.u, l.lbl, CAST(sum(e.w) AS BIGINT) AS ws FROM e JOIN l1 l ON e.v = l.node_id GROUP BY e.u, l.lbl),
        |l2 AS (SELECT u AS node_id, lbl FROM (
        |  SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u ORDER BY ws DESC, lbl) AS rn FROM r2) WHERE rn = 1),
        |r3 AS (SELECT e.u, l.lbl, CAST(sum(e.w) AS BIGINT) AS ws FROM e JOIN l2 l ON e.v = l.node_id GROUP BY e.u, l.lbl),
        |l3 AS (SELECT u AS node_id, lbl FROM (
        |  SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u ORDER BY ws DESC, lbl) AS rn FROM r3) WHERE rn = 1)
        |SELECT node_id, lbl AS community FROM l3""".stripMargin,

    // the LPA rounds above + the modularity arithmetic; HUGEINT
    // intermediates (DuckDB sum/products) cast back to BIGINT, floor
    // division identical to Spark's `div` on the non-negative operands
    "graph_modularity" ->
      (s"WITH $lpaCommunityCtes\n" +
      """SELECT ds.community, CAST(ds.n_nodes AS BIGINT) AS n_nodes,
        |  CAST(COALESCE(ein.e_in, 0) AS BIGINT) AS e_in,
        |  CAST(ds.deg_sum AS BIGINT) AS deg_sum,
        |  CAST(COALESCE(ein.e_in, 0) * 1000000000 // m.m
        |    - ds.deg_sum * ds.deg_sum * 1000000000 // (4 * m.m * m.m) AS BIGINT) AS q_x1e9
        |FROM ds CROSS JOIN m LEFT JOIN ein ON ein.community = ds.community""".stripMargin),

    "graph_edge_support" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |thr AS (SELECT greatest(2, CAST(ceil(count(DISTINCT ok) * 13 / 1000000.0) AS BIGINT)) AS thr FROM li),
        |e0 AS (SELECT a.pk AS u, b.pk AS v
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY a.pk, b.pk HAVING count(*) >= (SELECT thr FROM thr)),
        |sym AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
        |w AS (SELECT e0.u, e0.v,
        |        least(e0.v, s.v) AS cu, greatest(e0.v, s.v) AS cv
        |      FROM e0 JOIN sym s ON s.u = e0.u WHERE s.v <> e0.v),
        |c AS (SELECT w.u, w.v, count(*) AS support
        |      FROM w JOIN e0 t ON t.u = w.cu AND t.v = w.cv
        |      GROUP BY w.u, w.v)
        |SELECT e0.u, e0.v,
        |  CAST(coalesce(c.support, 0) AS BIGINT) AS support,
        |  coalesce(c.support, 0) >= 1 AS in_3truss
        |FROM e0 LEFT JOIN c ON c.u = e0.u AND c.v = e0.v""".stripMargin,

    // same aggregates, the boundary-quality readout: cut = vol − 2·e_in
    "graph_community_conductance" ->
      (s"WITH $lpaCommunityCtes\n" +
      """SELECT ds.community, CAST(ds.n_nodes AS BIGINT) AS n_nodes,
        |  CAST(COALESCE(ein.e_in, 0) AS BIGINT) AS e_in,
        |  CAST(ds.deg_sum AS BIGINT) AS deg_sum,
        |  CAST(ds.deg_sum - 2 * COALESCE(ein.e_in, 0) AS BIGINT) AS cut,
        |  CAST((ds.deg_sum - 2 * COALESCE(ein.e_in, 0)) * 1000000
        |    // greatest(least(ds.deg_sum, 2 * m.m - ds.deg_sum), 1) AS BIGINT)
        |    AS conductance_ppm
        |FROM ds CROSS JOIN m LEFT JOIN ein ON ein.community = ds.community""".stripMargin),

    // triangles per corner + degrees over the same thresholded graph;
    // floor division matches Spark's `div` on non-negative operands
    "graph_clustering_coeff" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |thr AS (SELECT greatest(2, CAST(ceil(count(DISTINCT ok) * 13 / 1000000.0) AS BIGINT)) AS thr FROM li),
        |e AS (SELECT a.pk AS u, b.pk AS v
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY a.pk, b.pk HAVING count(*) >= (SELECT thr FROM thr)),
        |t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |      FROM e e1 JOIN e e2 ON e2.u = e1.v
        |      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |corners AS (SELECT a AS node_id FROM t
        |            UNION ALL SELECT b FROM t
        |            UNION ALL SELECT c FROM t),
        |tri AS (SELECT node_id, count(*) AS n_triangles FROM corners GROUP BY node_id),
        |deg AS (SELECT node_id, count(*) AS deg FROM
        |          (SELECT u AS node_id FROM e UNION ALL SELECT v FROM e)
        |        GROUP BY node_id)
        |SELECT deg.node_id, deg.deg,
        |  COALESCE(tri.n_triangles, 0) AS n_triangles,
        |  (2000000 * COALESCE(tri.n_triangles, 0)) // (deg.deg * (deg.deg - 1)) AS lcc_x1e6
        |FROM deg LEFT JOIN tri ON tri.node_id = deg.node_id
        |WHERE deg.deg >= 2""".stripMargin,

    // 3 unrolled min-plus relaxation rounds over the weighted edges
    "graph_sssp_weighted" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |thr AS (SELECT greatest(2, CAST(ceil(count(DISTINCT ok) * 13 / 1000000.0) AS BIGINT)) AS thr FROM li),
        |e0 AS (SELECT a.pk AS u, b.pk AS v, count(*) AS sup
        |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |       GROUP BY a.pk, b.pk HAVING count(*) >= (SELECT thr FROM thr)),
        |e AS (SELECT u, v, 1000000 // sup AS w FROM e0
        |      UNION ALL SELECT v, u, 1000000 // sup FROM e0),
        |d0 AS (SELECT p_partkey AS node_id, CAST(0 AS BIGINT) AS dist
        |       FROM part WHERE p_partkey < 100),
        |d1 AS (SELECT node_id, min(dist) AS dist FROM (
        |  SELECT node_id, dist FROM d0
        |  UNION ALL SELECT e.v AS node_id, d0.dist + e.w AS dist
        |  FROM e JOIN d0 ON e.u = d0.node_id) GROUP BY node_id),
        |d2 AS (SELECT node_id, min(dist) AS dist FROM (
        |  SELECT node_id, dist FROM d1
        |  UNION ALL SELECT e.v AS node_id, d1.dist + e.w AS dist
        |  FROM e JOIN d1 ON e.u = d1.node_id) GROUP BY node_id),
        |d3 AS (SELECT node_id, min(dist) AS dist FROM (
        |  SELECT node_id, dist FROM d2
        |  UNION ALL SELECT e.v AS node_id, d2.dist + e.w AS dist
        |  FROM e JOIN d2 ON e.u = d2.node_id) GROUP BY node_id)
        |SELECT node_id, dist FROM d3""".stripMargin
  )

  /** The LPA-communities + per-community (e_in, deg_sum) CTE chain,
    * shared by the modularity and conductance oracles so the LPA
    * rounds and aggregates exist exactly once on the oracle side. */
  private lazy val lpaCommunityCtes: String =
    """li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |thr AS (SELECT greatest(2, CAST(ceil(count(DISTINCT ok) * 13 / 1000000.0) AS BIGINT)) AS thr FROM li),
      |e0 AS (SELECT a.pk AS u, b.pk AS v
      |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      |       GROUP BY a.pk, b.pk HAVING count(*) >= (SELECT thr FROM thr)),
      |e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
      |l0 AS (SELECT DISTINCT u AS node_id, u AS lbl FROM e),
      |r1 AS (SELECT e.u, l.lbl, count(*) AS c FROM e JOIN l0 l ON e.v = l.node_id GROUP BY e.u, l.lbl),
      |l1 AS (SELECT u AS node_id, lbl FROM (
      |  SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u ORDER BY c DESC, lbl) AS rn FROM r1) WHERE rn = 1),
      |r2 AS (SELECT e.u, l.lbl, count(*) AS c FROM e JOIN l1 l ON e.v = l.node_id GROUP BY e.u, l.lbl),
      |l2 AS (SELECT u AS node_id, lbl FROM (
      |  SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u ORDER BY c DESC, lbl) AS rn FROM r2) WHERE rn = 1),
      |r3 AS (SELECT e.u, l.lbl, count(*) AS c FROM e JOIN l2 l ON e.v = l.node_id GROUP BY e.u, l.lbl),
      |l3 AS (SELECT u AS node_id, lbl FROM (
      |  SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u ORDER BY c DESC, lbl) AS rn FROM r3) WHERE rn = 1),
      |m AS (SELECT count(*) AS m FROM e0),
      |deg AS (SELECT node_id, count(*) AS deg FROM
      |          (SELECT u AS node_id FROM e0 UNION ALL SELECT v FROM e0)
      |        GROUP BY node_id),
      |ein AS (SELECT lu.lbl AS community, count(*) AS e_in
      |        FROM e0 JOIN l3 lu ON lu.node_id = e0.u
      |        JOIN l3 lv ON lv.node_id = e0.v
      |        WHERE lu.lbl = lv.lbl GROUP BY 1),
      |ds AS (SELECT l3.lbl AS community, sum(deg.deg) AS deg_sum, count(*) AS n_nodes
      |       FROM l3 JOIN deg ON deg.node_id = l3.node_id GROUP BY 1)""".stripMargin
}
