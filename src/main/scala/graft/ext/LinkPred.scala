package graft.ext

import graft.Q
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link prediction over an undirected graph — the "which edges are
  * missing" face of the graph family (triangles/LPA/PageRank tell you
  * about edges that EXIST): for every non-adjacent node pair with at
  * least `minCommon` common neighbours, the three classic neighbourhood
  * scores (Liben-Nowell & Kleinberg, CIKM'03; Zhou/Lü/Zhang, EPJ B'09):
  *
  *   - `cn`          — common-neighbour count |Γ(u) ∩ Γ(v)| (integer)
  *   - `ra_x1e6`     — resource allocation Σ_{w ∈ Γ(u)∩Γ(v)} 1/deg(w),
  *                     integer-scaled as Σ (1e6 div deg(w)) so the
  *                     floor-divided per-wedge contributions sum exactly
  *                     the same in any engine (RA is the score that wins
  *                     the Zhou et al. benchmarks; Adamic-Adar's 1/log
  *                     deg needs transcendental arithmetic, RA does not
  *                     — deliberately the exact-arithmetic member)
  *   - `jaccard_x1e6` — 1e6·cn div (deg(u) + deg(v) − cn)
  *
  * 100 TB shape: wedge enumeration through the CENTER node — each node w
  * emits its neighbour pairs (a<b), so the join fans out Σ_w C(deg w, 2).
  * On an unbounded power-law graph that is hub-quadratic; here the
  * co-purchase edge set is support-floored ([[GraphOps.copurchaseEdges]]
  * keeps pair support ≥ max(2, 13 ppm of orders)), which pins graph
  * density — and hence the max degree — CONSTANT in corpus scale
  * (measured ≈3.5k edges at every probe scale), so the wedge volume is
  * bounded by construction. For a graph without such a floor the
  * standard mitigation is a per-node neighbour cap on the center list
  * (top-k by (support, id) — the df-cap move of `dedup_ngram_jaccard`),
  * which bounds fan-out at the cost of recall on hub-mediated pairs;
  * the support floor makes that unnecessary here. Three shuffles total:
  * degree count, wedge self-join on the center key, pair aggregate; the
  * adjacency anti-join rides the pair key.
  *
  * Everything downstream of the wedge join moves only (u, v, w) triples
  * and per-pair aggregates — never neighbour lists.
  */
object LinkPred {

  /** Scores for non-adjacent pairs of `edges(u, v)` (any orientation,
    * duplicates/self-loops tolerated) with ≥ `minCommon` common
    * neighbours. Returns (u, v, cn, ra_x1e6, jaccard_x1e6), u < v.
    */
  def linkPredictionScores(edges: DataFrame, minCommon: Long = 2L,
                           scale: Long = 1000000L): DataFrame = {
    val und = edges.select(
        least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val sym = und.unionAll(und.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
    // neighbour pairs THROUGH each center w; a<b canonicalizes the pair
    val nbr = sym.select(col("u").as("w"), col("v").as("n"))
    val wedges = nbr.as("x").join(nbr.as("y"),
        col("x.w") === col("y.w") && col("x.n") < col("y.n"))
      .select(col("x.n").as("u"), col("y.n").as("v"), col("x.w").as("w"))
    val scored = wedges
      .join(deg.select(col("node").as("w"), col("deg").as("dw")), "w")
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"),
        sum(expr(s"${scale}L div dw")).as("ra_x1e6"))
      .where(col("cn") >= minCommon)
    scored
      .join(und, Seq("u", "v"), "left_anti") // predicted = NOT already an edge
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(col("u"), col("v"), col("cn"), col("ra_x1e6"),
        expr(s"(cn * ${scale}L) div (du + dv - cn)").as("jaccard_x1e6"))
  }

  /** Adamic–Adar in the exact-arithmetic base-2 form: the classic
    * Σ 1/log deg(w) down-weights hub-mediated wedges; the transcendental
    * log is replaced by the engine-portable floor-log2
    * (`length(bin(deg)) − 1`, the [[LmStats]] bit-log discipline), so
    * per-wedge contributions are `1e6 div floor_log2(deg(w))` — exact
    * integers that sum identically in any engine. A wedge center has
    * ≥ 2 neighbours by construction, so floor_log2(deg) ≥ 1 and the
    * division never sees zero. Same three-shuffle shape as
    * [[linkPredictionScores]]; only the per-wedge weight changes, and
    * the emitted set is the global top-`topN` CANDIDATE RANKING
    * (aa desc, cn desc, u, v) over cn ≥ 1 pairs rather than the
    * cn ≥ 2 cut — on the support-floored graph the absolute-2 floor
    * goes vacuous as the catalogue outgrows the constant edge budget
    * (0 rows at sf0.1), while the ranked list is non-empty and
    * k-bounded at every scale (TakeOrdered: per-partition heap +
    * driver merge of topN rows, never a global sort).
    * Returns non-adjacent (u, v, cn, aa_x1e6), u < v.
    */
  def adamicAdarScores(edges: DataFrame, topN: Int = 200,
                       scale: Long = 1000000L): DataFrame = {
    val und = edges.select(
        least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val sym = und.unionAll(und.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
    val nbr = sym.select(col("u").as("w"), col("v").as("n"))
    val wedges = nbr.as("x").join(nbr.as("y"),
        col("x.w") === col("y.w") && col("x.n") < col("y.n"))
      .select(col("x.n").as("u"), col("y.n").as("v"), col("x.w").as("w"))
    wedges
      .join(deg.select(col("node").as("w"), col("deg").as("dw")), "w")
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"),
        sum(expr(s"${scale}L div (length(bin(dw)) - 1)")).as("aa_x1e6"))
      .join(und, Seq("u", "v"), "left_anti")
      .select(col("u"), col("v"), col("cn"), col("aa_x1e6"))
      .orderBy(col("aa_x1e6").desc, col("cn").desc, col("u"), col("v"))
      .limit(topN)
  }

  val queries: Map[String, Q] = Map(
    // missing-edge candidates on the support-floored co-purchase graph:
    // parts never bought together but sharing >= 2 co-purchase partners
    "graph_link_prediction" -> ((s, dir) =>
      linkPredictionScores(GraphOps.copurchaseEdges(s, dir))),

    // the hub-discounted variant over the same graph
    "link_pred_adamic_adar" -> ((s, dir) =>
      adamicAdarScores(GraphOps.copurchaseEdges(s, dir)))
  )

  val oracleSql: Map[String, String] = Map(
    "graph_link_prediction" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |thr AS (SELECT greatest(2, CAST(ceil(count(DISTINCT ok) * 13 / 1000000.0) AS BIGINT)) AS thr FROM li),
        |e AS (SELECT a.pk AS u, b.pk AS v
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY a.pk, b.pk HAVING count(*) >= (SELECT thr FROM thr)),
        |sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT u AS node, count(*) AS deg FROM sym GROUP BY u),
        |wedges AS (SELECT x.n AS u, y.n AS v, x.w AS w
        |           FROM (SELECT u AS w, v AS n FROM sym) x
        |           JOIN (SELECT u AS w, v AS n FROM sym) y
        |             ON x.w = y.w AND x.n < y.n),
        |scored AS (SELECT w2.u, w2.v, count(*) AS cn,
        |             CAST(sum(1000000 // d.deg) AS BIGINT) AS ra_x1e6
        |           FROM wedges w2 JOIN deg d ON d.node = w2.w
        |           GROUP BY w2.u, w2.v HAVING count(*) >= 2)
        |SELECT s.u, s.v, s.cn, s.ra_x1e6,
        |  (s.cn * 1000000) // (du.deg + dv.deg - s.cn) AS jaccard_x1e6
        |FROM scored s
        |JOIN deg du ON du.node = s.u
        |JOIN deg dv ON dv.node = s.v
        |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = s.u AND e.v = s.v)""".stripMargin,

    "link_pred_adamic_adar" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |thr AS (SELECT greatest(2, CAST(ceil(count(DISTINCT ok) * 13 / 1000000.0) AS BIGINT)) AS thr FROM li),
        |e AS (SELECT a.pk AS u, b.pk AS v
        |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |      GROUP BY a.pk, b.pk HAVING count(*) >= (SELECT thr FROM thr)),
        |sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT u AS node, count(*) AS deg FROM sym GROUP BY u),
        |wedges AS (SELECT x.n AS u, y.n AS v, x.w AS w
        |           FROM (SELECT u AS w, v AS n FROM sym) x
        |           JOIN (SELECT u AS w, v AS n FROM sym) y
        |             ON x.w = y.w AND x.n < y.n)
        |SELECT w2.u, w2.v, count(*) AS cn,
        |  CAST(sum(1000000 // (length(bin(d.deg)) - 1)) AS BIGINT) AS aa_x1e6
        |FROM wedges w2 JOIN deg d ON d.node = w2.w
        |GROUP BY w2.u, w2.v
        |HAVING NOT EXISTS (SELECT 1 FROM e WHERE e.u = w2.u AND e.v = w2.v)
        |ORDER BY aa_x1e6 DESC, cn DESC, w2.u, w2.v
        |LIMIT 200""".stripMargin
  )
}
