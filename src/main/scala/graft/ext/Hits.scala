package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (hubs & authorities) — the second classic link-analysis
  * fixed-point beside [[PageRank]], formulated INTEGER-EXACT with the
  * same discipline: floor-divided longs, L1 normalization instead of
  * the textbook L2 (a square root has no exact integer form; L1 keeps
  * the fixed point equivalent up to scale and makes every half-step
  * bit-reproducible in any engine).
  *
  * Per iteration, mirrored verbatim in the unrolled DuckDB CTE oracle:
  *
  *   rawA(v) = Σ_{u→v} h_t(u);   a_{t+1}(v) = rawA(v)·scale div Σ rawA
  *   rawH(u) = Σ_{u→v} a_{t+1}(v); h_{t+1}(u) = rawH(u)·scale div Σ rawH
  *
  * Hub scores live on nodes with out-edges, authority scores on nodes
  * with in-edges (on the supplier→part bipartite graph those are
  * exactly the two vertex classes).
  *
  * 100 TB shape: each half-step is ONE edge-keyed equi-join against a
  * node-sized score table plus a map-side-combining sum; the L1 total
  * is a 1-row aggregate cross-joined back (never collected). Overflow
  * head-room: `raw·scale` with scale=10⁶ requires raw < 9.2e12, i.e.
  * per-node degree < 9.2e6 — beyond that, drop scale or pre-aggregate
  * hub mass per (dst, src-bucket). Reference operator inventory:
  * SURVEY.md §2 graph family.
  */
object Hits {

  /** `iterations` full HITS rounds over `edges(src, dst)`; returns
    * (node_id, kind ∈ {hub, auth}, score) with Σ score ≈ scale per kind.
    */
  def hitsInt(edges: DataFrame, iterations: Int,
              scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // every raw-score table is PERSISTED before its L1 total is taken:
    // the total and the normalized scores both read it, and the next
    // half-step reads the normalized scores again — left lazy, each
    // half-step would recompute its whole upstream chain and the DAG
    // cost doubles per half-step (measured 24 s → 1.7 s at sf0.1 for
    // 2 iterations on the supplier→part graph)
    // (entries are node-sized; released by the session's clearCache
    // discipline, same as the PageRank family)
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var hubs = e.select(col("src").as("u")).distinct()
      .withColumn("h", lit(scale))
    var auths: DataFrame = null
    for (_ <- 0 until iterations) {
      val rawA = e.join(hubs.withColumnRenamed("u", "src"), "src")
        .groupBy(col("dst").as("v")).agg(sum(col("h")).as("raw"))
        .persist(level)
      val totA = rawA.agg(sum(col("raw")).as("tot"))
      auths = rawA.crossJoin(totA)
        .select(col("v"), expr(s"raw * $scale div tot").as("a"))
      val rawH = e.join(auths.withColumnRenamed("v", "dst"), "dst")
        .groupBy(col("src").as("u")).agg(sum(col("a")).as("raw"))
        .persist(level)
      val totH = rawH.agg(sum(col("raw")).as("tot"))
      hubs = rawH.crossJoin(totH)
        .select(col("u"), expr(s"raw * $scale div tot").as("h"))
    }
    hubs.select(col("u").as("node_id"), lit("hub").as("kind"),
        col("h").as("score"))
      .unionByName(auths.select(col("v").as("node_id"),
        lit("auth").as("kind"), col("a").as("score")))
  }

  val queries: Map[String, Q] = Map(
    // the PageRank family's supplier→part bipartite graph: hubs =
    // diversified suppliers, authorities = widely-sourced parts
    "graph_hits" -> ((s, dir) => {
      val edges = Tables.lineitem(s, dir)
        .select(col("l_suppkey").cast("long").as("src"),
          (col("l_partkey") + lit(1000000L)).as("dst"))
        .distinct()
      hitsInt(edges, iterations = 2)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "graph_hits" ->
      """WITH e AS (
        |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
        |    CAST(l_partkey + 1000000 AS BIGINT) AS dst
        |  FROM lineitem),
        |h0 AS (SELECT DISTINCT src AS u, CAST(1000000 AS BIGINT) AS h FROM e),
        |ra1 AS (SELECT e.dst AS v, CAST(sum(h0.h) AS BIGINT) AS raw
        |        FROM e JOIN h0 ON h0.u = e.src GROUP BY e.dst),
        |ta1 AS (SELECT CAST(sum(raw) AS BIGINT) AS tot FROM ra1),
        |a1 AS (SELECT v, raw * 1000000 // tot AS a FROM ra1, ta1),
        |rh1 AS (SELECT e.src AS u, CAST(sum(a1.a) AS BIGINT) AS raw
        |        FROM e JOIN a1 ON a1.v = e.dst GROUP BY e.src),
        |th1 AS (SELECT CAST(sum(raw) AS BIGINT) AS tot FROM rh1),
        |h1 AS (SELECT u, raw * 1000000 // tot AS h FROM rh1, th1),
        |ra2 AS (SELECT e.dst AS v, CAST(sum(h1.h) AS BIGINT) AS raw
        |        FROM e JOIN h1 ON h1.u = e.src GROUP BY e.dst),
        |ta2 AS (SELECT CAST(sum(raw) AS BIGINT) AS tot FROM ra2),
        |a2 AS (SELECT v, raw * 1000000 // tot AS a FROM ra2, ta2),
        |rh2 AS (SELECT e.src AS u, CAST(sum(a2.a) AS BIGINT) AS raw
        |        FROM e JOIN a2 ON a2.v = e.dst GROUP BY e.src),
        |th2 AS (SELECT CAST(sum(raw) AS BIGINT) AS tot FROM rh2),
        |h2 AS (SELECT u, raw * 1000000 // tot AS h FROM rh2, th2)
        |SELECT u AS node_id, 'hub' AS kind, CAST(h AS BIGINT) AS score FROM h2
        |UNION ALL
        |SELECT v, 'auth', CAST(a AS BIGINT) FROM a2""".stripMargin
  )
}
