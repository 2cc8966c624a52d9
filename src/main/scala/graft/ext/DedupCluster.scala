package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTERING — the step a real curation pipeline runs on
  * top of pair emission: near-dup pairs form a graph, a document is
  * dropped if any transitive chain of near-dups connects it to a kept
  * one, so dedup decisions need connected components, not pairs.
  * (The reference's analogue of transitive grouping is its per-connection
  * RLE index build — grouping rows into maximal related runs,
  * /root/reference/src/index/index.cpp:114-153 — but component closure
  * over a similarity graph is a training-data concern the reference
  * never had; the algorithm here is the published MapReduce one.)
  *
  * Components are computed with alternating large-star / small-star
  * contractions (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14): O(log²) rounds, every round is groupBy/join keyed
  * on node ids — map-side-combined aggregates plus co-partitioned joins,
  * no driver-side graph state, no `collect()`. That is the 100 TB shape:
  * label-propagation converges only in O(diameter) rounds, and GraphX/
  * Pregel would pull in RDD caching semantics for what is three
  * DataFrame operators per round. High-degree hubs are exactly what
  * large-star handles: a hub's neighbors re-attach to the component
  * minimum rather than to the hub, so star skew shrinks itself.
  *
  * Each round materializes via `localCheckpoint` — iterative self-joins
  * otherwise double the lineage every round and analysis cost explodes
  * by round ~10. On a real cluster with executor churn, swap for
  * reliable `checkpoint` to a DFS dir; the algorithm is unchanged.
  */
object DedupCluster {

  /** Connected components of the undirected graph given as an edge list
    * with columns `u`, `v` (self-loops and duplicates tolerated).
    * Returns (node, component) for every node incident to ≥1 edge, where
    * component = the minimum node id in the node's component. Isolated
    * nodes never enter the edge list and are the caller's default case.
    */
  /** Large-star: every node re-points its LARGER neighbors at the
    * minimum of its closed neighborhood. One symmetrize, one min
    * aggregate, one co-partitioned join — all keyed on u. The output is
    * NOT deduplicated: it feeds straight into [[smallStar]], whose
    * leading `distinct` dedups anyway, so a trailing distinct here would
    * be a full extra exchange per round for nothing.
    * Package-visible so PlanSpec pins the PER-ROUND plan shape (the
    * loop checkpoints every round, so the converged plan alone would
    * not witness it).
    */
  private[graft] def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy(col("u")).agg(min(col("v")).as("_mn"))
      .select(col("u"), least(col("u"), col("_mn")).as("_m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("_m").as("v"))
  }

  /** Small-star: direct edges large→small, then re-point every node's
    * smaller neighbors (and itself) at its minimum neighbor.
    */
  private[graft] def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val mins = dir.groupBy(col("u")).agg(min(col("v")).as("_m"))
    mins.select(col("u"), col("_m").as("v"))
      .union(dir.join(mins, "u")
        .filter(col("v") =!= col("_m"))
        .select(col("v").as("u"), col("_m").as("v")))
      .distinct()
  }

  def connectedComponents(edges: DataFrame, maxRounds: Int = 30): DataFrame = {
    // Convergence check = (row count, order-independent hash sum) of the
    // distinct edge set: one tiny aggregate per round instead of a full
    // set-difference join. A count+sum collision between two DIFFERENT
    // consecutive edge sets would need a 128-bit coincidence.
    def signature(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head
      (r.getLong(0),
        if (r.isNullAt(1)) java.math.BigDecimal.valueOf(0) else r.getDecimal(1))
    }

    var cur = edges
      .select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var sig = signature(cur)
    var converged = sig._1 == 0L
    var round = 0
    // The per-round shuffles carry the (shrinking) edge set, so size them
    // to the MEASURED edge count, not the session default: a near-dup
    // pair graph is orders of magnitude smaller than the corpus that
    // produced it, and every round pays ~7 exchanges. ~2M edges
    // (≈32 MB of (u,v) rows) per partition; restored in `finally`
    // (same scoping discipline as the streaming shuffle override).
    //
    // NOTE: this mutates the SESSION-global shuffle-partition conf for the
    // duration of the loop — correct for the single-threaded sessions this
    // library runs in (one query at a time per SparkSession); a host
    // running concurrent queries on a shared session should pass a
    // dedicated session (`spark.newSession()`) into the dedup pipeline.
    // Parsed defensively: a non-numeric value (e.g. a vendor "auto")
    // skips the override rather than throwing.
    val spark = edges.sparkSession
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val scopedParts = scala.util.Try(prevParts.toLong).toOption
      .map(p => math.max(1L, math.min(p, sig._1 / 2000000L + 1L)))
    try {
      scopedParts.foreach(p =>
        spark.conf.set("spark.sql.shuffle.partitions", p.toString))
      while (!converged && round < maxRounds) {
        // LAZY checkpoint: the signature aggregate is the round's single
        // action — it materializes the checkpoint blocks and computes the
        // convergence signature in one job instead of two.
        val next = smallStar(largeStar(cur)).localCheckpoint(eager = false)
        val nsig = signature(next)
        converged = nsig == sig
        // `next` is fully materialized, so the previous round's blocks are
        // no longer reachable — release them instead of accumulating
        // O(rounds) copies of the edge set in the block manager. This must
        // go through the LogicalRDD leaf: Dataset.unpersist is a no-op on
        // a local checkpoint (it never registers with the CacheManager).
        org.apache.spark.sql.GraftSqlShim.unpersistLocalCheckpoint(cur)
        cur = next
        sig = nsig
        round += 1
      }
      require(converged, s"connectedComponents did not converge in $maxRounds rounds")
      // The label table is checkpointed (it is node-count-sized, no
      // bigger than the edge set) so the converged edge-set blocks can
      // be released NOW instead of leaking past the call —
      // `clearCache()` cannot reach local-checkpoint blocks.
      val labels = assembleLabels(cur).localCheckpoint()
      org.apache.spark.sql.GraftSqlShim.unpersistLocalCheckpoint(cur)
      labels
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  /** Converged state is a union of stars: (member, component-min) edges.
    * Roots appear only on the v side and label themselves; the final
    * min-aggregate is cheap insurance, not load-bearing. Package-visible
    * so PlanSpec pins the assembly's plan shape (the public API
    * checkpoints the result, which would hide it).
    */
  private[graft] def assembleLabels(cur: DataFrame): DataFrame =
    cur.groupBy(col("u").as("node")).agg(min(col("v")).as("component"))
      .unionByName(cur.select(col("v").as("node"), col("v").as("component")).distinct())
      .groupBy(col("node")).agg(min(col("component")).as("component"))

  /** (doc_id, cluster_id) for every document, closing the given near-dup
    * pair list (columns doc_a, doc_b) transitively; cluster_id = the
    * smallest doc_id in the cluster, singletons label themselves. The
    * docs side carries only doc_id into the join — at 100 TB the labels
    * table is sized by the deduped fraction, so no broadcast hint: AQE
    * picks broadcast when the graph is small and a plain shuffle join
    * when it is not.
    */
  def clusterAssignments(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(
      pairs.select(col("doc_a").as("u"), col("doc_b").as("v")))
    docs.select(col("doc_id"))
      .join(cc.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"))
  }

  /** The deduplicated corpus: one representative (the minimum doc_id) per
    * cluster, annotated with how many documents it stands for. This is
    * the operator whose output feeds training.
    */
  def canonicalCorpus(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val lab = clusterAssignments(docs, pairs)
    val sizes = lab.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    docs.join(sizes, docs("doc_id") === sizes("cluster_id"))
      .select(docs("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("cluster_size"))
  }

  // The DuckDB side closes the SAME pair graph (shared CTE chain from
  // Dedup.ngramCtesFor, identical 0.12 threshold) with a recursive
  // transitive closure — fine at oracle scale, impossible at 100 TB,
  // which is exactly why the Spark side is star-contraction. `pred`
  // restricts the labeled document set ([[Curate]] labels train-only).
  private[ext] def closureCtesFor(pred: String): String =
    s"""pairs AS (
      |  SELECT doc_a, doc_b FROM inter
      |  JOIN sizes sa ON sa.doc_id = doc_a
      |  JOIN sizes sb ON sb.doc_id = doc_b
      |  WHERE n_common / (sa.n_shingles + sb.n_shingles - n_common) >= 0.12),
      |edges AS (
      |  SELECT doc_a AS u, doc_b AS v FROM pairs
      |  UNION SELECT doc_b AS u, doc_a AS v FROM pairs),
      |reach AS (
      |  SELECT u, v FROM edges
      |  UNION
      |  SELECT r.u AS u, e.v AS v FROM reach r JOIN edges e ON r.v = e.u
      |  WHERE e.v <> r.u),
      |mins AS (SELECT u AS doc_id, min(v) AS mn FROM reach GROUP BY u),
      |lab AS (
      |  SELECT d.doc_id, COALESCE(LEAST(m.mn, d.doc_id), d.doc_id) AS cluster_id
      |  FROM documents d LEFT JOIN mins m ON m.doc_id = d.doc_id
      |  WHERE $pred)""".stripMargin

  private val closureCtes: String = closureCtesFor("TRUE")

  val queries: Map[String, Q] = Map(
    "dedup_cluster_cc" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      clusterAssignments(docs, Dedup.ngramJaccardPairs(docs, 0.12))
    }),
    "dedup_canonical_corpus" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      canonicalCorpus(docs, Dedup.ngramJaccardPairs(docs, 0.12))
    }),
    // Quality-priority canonical selection: real curation keeps the
    // BEST document per near-dup cluster, not the lowest id — here the
    // one with the most distinct tokens (an integer-exact quality
    // proxy; richer scores slot into the same argmax), ties to the
    // smaller doc_id. One integer struct-max per cluster
    // (max(struct(n_uniq, -doc_id)) — map-side combining, no window)
    // on top of the same CC labels, so the extra cost over
    // dedup_canonical_corpus is one equi-join with the per-doc score.
    "dedup_keep_best" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val lab = clusterAssignments(docs, Dedup.ngramJaccardPairs(docs, 0.12))
      val uniq = docs.select(col("doc_id"),
        size(array_distinct(TextAnalysis.tokens(col("text")))).cast("long").as("n_uniq"))
      lab.join(uniq, "doc_id")
        .groupBy(col("cluster_id"))
        .agg(max(struct(col("n_uniq").as("q"), (-col("doc_id")).as("neg_id"))).as("best"),
          count(lit(1)).as("cluster_size"))
        .select(col("cluster_id"), (-col("best.neg_id")).as("doc_id"),
          col("best.q").as("n_uniq"), col("cluster_size"))
    }),

    // Leakage-safe train/valid/test split: hash the CLUSTER id, not the
    // doc id, so a whole near-dup family lands in one split — splitting
    // by doc hash puts near-copies of a training doc in the test set,
    // the standard contamination failure a dedup pass exists to prevent.
    // Same 80/10/10 md5-bucket rule as train_valid_test_split, applied
    // to the CC label; cost over plain splitting is exactly the
    // clustering (one extra equi-join, nothing per-pair).
    "split_cluster_aware" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      clusterAssignments(docs, Dedup.ngramJaccardPairs(docs, 0.12))
        .select(col("doc_id"), col("cluster_id"),
          Sampling.splitLabel(col("cluster_id")).as("split"))
    }),

    // Duplicate-family size spectrum — "how big do near-dup families
    // get" is the dedup-health readout beside the duplication rate:
    // (cluster_size, n_clusters, n_docs) over the CC labels, a
    // ≤log-sized histogram (family sizes are bounded by the template
    // structure) from two keyed aggregates on the cluster table.
    "dedup_cluster_sizes" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      clusterAssignments(docs, Dedup.ngramJaccardPairs(docs, 0.12))
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
        .select(col("cluster_size"), col("n_clusters"),
          (col("n_clusters") * col("cluster_size")).as("n_docs"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "dedup_cluster_cc" ->
      (s"WITH RECURSIVE ${Dedup.ngramCtes},\n$closureCtes\n" +
        "SELECT doc_id, cluster_id FROM lab"),

    "dedup_cluster_sizes" ->
      (s"WITH RECURSIVE ${Dedup.ngramCtes},\n$closureCtes,\n" +
        """sz AS (SELECT cluster_id, count(*) AS cluster_size
          |        FROM lab GROUP BY cluster_id)
          |SELECT cluster_size, count(*) AS n_clusters,
          |  count(*) * cluster_size AS n_docs
          |FROM sz GROUP BY cluster_size""".stripMargin),
    "dedup_canonical_corpus" ->
      (s"WITH RECURSIVE ${Dedup.ngramCtes},\n$closureCtes\n" +
      """SELECT d.doc_id, d.lang, d.source, d.n_chars, sz.cluster_size
        |FROM (SELECT cluster_id, count(*) AS cluster_size
        |      FROM lab GROUP BY cluster_id) sz
        |JOIN documents d ON d.doc_id = sz.cluster_id""".stripMargin),
    // per-cluster argmax by (distinct-token count DESC, doc_id ASC)
    "dedup_keep_best" ->
      (s"WITH RECURSIVE ${Dedup.ngramCtes},\n$closureCtes,\n" +
      """uniq AS (
        |  SELECT doc_id,
        |    CAST(len(list_distinct(list_filter(string_split_regex(text, '\s+'), x -> x != ''))) AS BIGINT) AS n_uniq
        |  FROM documents),
        |ranked AS (
        |  SELECT lab.cluster_id, lab.doc_id, uniq.n_uniq,
        |    ROW_NUMBER() OVER (PARTITION BY lab.cluster_id
        |      ORDER BY uniq.n_uniq DESC, lab.doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lab.cluster_id) AS cluster_size
        |  FROM lab JOIN uniq ON uniq.doc_id = lab.doc_id)
        |SELECT cluster_id, doc_id, n_uniq, cluster_size FROM ranked WHERE rn = 1""".stripMargin),
    "split_cluster_aware" ->
      (s"WITH RECURSIVE ${Dedup.ngramCtes},\n$closureCtes\n" +
      """SELECT doc_id, cluster_id,
        |  CASE WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 4)) AS BIGINT) < 52429 THEN 'train'
        |       WHEN CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 4)) AS BIGINT) < 58982 THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM lab""".stripMargin)
  )
}
