package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
  * the word co-occurrence graph — tokens are nodes, adjacent-token
  * pairs are undirected weighted edges, and the stationary score ranks
  * keywords. Reuses [[Collocations]]' zip_with bigram extraction (no
  * posexplode self-join) and [[PageRank]]'s integer-exact discipline,
  * extended to WEIGHTED contributions:
  *
  *   r_{t+1}(v) = (15·scale div 100) div N
  *              + 85 · Σ_{u→v} (r_t(u) · w(u,v) div strength(u)) div 100
  *
  * with strength(u) = Σ w(u,·). Every step is floor-divided longs,
  * mirrored verbatim in the unrolled DuckDB CTE — the whole keyword
  * ranking is hash-exact. Overflow audit: r ≤ ~scale (mass shrinks
  * under truncation), so r·w needs w < 9.2e12 per edge pair — far past
  * any real co-occurrence count.
  *
  * 100 TB shape: bigram counting is a map-side-combining aggregate over
  * codegen'd zip_with pairs; each of the two rounds is ONE edge-keyed
  * join against the node-sized rank table plus a keyed sum (the
  * PageRank shape); the final top-k is a TakeOrdered heap, never a
  * global sort. The `minCount` floor keeps edge density constant as the
  * corpus grows (the same relative-support argument as the co-purchase
  * graph family).
  */
object TextRank {

  /** Top-`k` keywords by 2-round weighted integer TextRank over
    * `docs(doc_id, text)`: (token, rank) — co-occurrence edges are
    * adjacent token pairs with count ≥ `minCount`, self-pairs dropped.
    */
  def keywordsTopK(docs: DataFrame, k: Int, minCount: Int,
                   iterations: Int = 2, scale: Long = 1000000L): DataFrame = {
    val toks = docs.select(TextAnalysis.tokens(col("text")).as("toks"))
    val bi = toks
      .where(size(col("toks")) >= 2)
      .select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .where(col("w1") =!= col("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("wt"))
      .where(col("wt") >= minCount)
    val e = bi.select(col("w1").as("src"), col("w2").as("dst"), col("wt"))
      .unionByName(bi.select(col("w2").as("src"), col("w1").as("dst"), col("wt")))
      .groupBy(col("src"), col("dst")).agg(sum(col("wt")).as("wt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("token")).distinct()
    val strength = e.groupBy(col("src")).agg(sum(col("wt")).as("s"))
    val n = nodes.agg(count(lit(1)).as("n_nodes"))
    var ranks = nodes.crossJoin(n)
      .select(col("token"), expr(s"$scale div n_nodes").as("rank"))
    for (_ <- 0 until iterations) {
      val contrib = e.join(strength, "src")
        .join(ranks.withColumnRenamed("token", "src"), "src")
        .select(col("dst").as("token"), expr("rank * wt div s").as("c"))
        .groupBy(col("token")).agg(sum(col("c")).as("contrib"))
      ranks = nodes.crossJoin(n)
        .join(contrib, Seq("token"), "left")
        .select(col("token"),
          (expr(s"(15 * $scale div 100) div n_nodes") +
            expr("85 * coalesce(contrib, 0L) div 100")).as("rank"))
    }
    ranks.orderBy(col("rank").desc, col("token")).limit(k)
  }

  val queries: Map[String, Q] = Map(
    "textrank_keywords" -> ((s, dir) =>
      keywordsTopK(Tables.documents(s, dir), k = 30, minCount = 3))
  )

  val oracleSql: Map[String, String] = Map(
    "textrank_keywords" ->
      """WITH tk AS (
        |  SELECT list_filter(string_split_regex(text, '\s+'), x -> x != '') AS toks
        |  FROM documents),
        |bi AS (
        |  SELECT toks[t.i] AS w1, toks[t.i + 1] AS w2, count(*) AS wt
        |  FROM tk, UNNEST(generate_series(1, len(toks) - 1)) AS t(i)
        |  WHERE len(toks) >= 2 AND toks[t.i] != toks[t.i + 1]
        |  GROUP BY 1, 2
        |  HAVING count(*) >= 3),
        |e AS (
        |  SELECT src, dst, CAST(sum(wt) AS BIGINT) AS wt FROM (
        |    SELECT w1 AS src, w2 AS dst, wt FROM bi
        |    UNION ALL SELECT w2, w1, wt FROM bi)
        |  GROUP BY src, dst),
        |nodes AS (SELECT DISTINCT src AS token FROM e),
        |n AS (SELECT count(*) AS n_nodes FROM nodes),
        |st AS (SELECT src, CAST(sum(wt) AS BIGINT) AS s FROM e GROUP BY src),
        |r0 AS (SELECT token, CAST(1000000 // n_nodes AS BIGINT) AS rank
        |       FROM nodes, n),
        |c1 AS (SELECT e.dst AS token, CAST(sum(r.rank * e.wt // st.s) AS BIGINT) AS contrib
        |       FROM e JOIN st ON st.src = e.src JOIN r0 r ON r.token = e.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT nodes.token,
        |         CAST((15 * 1000000 // 100) // n_nodes
        |           + 85 * COALESCE(c1.contrib, 0) // 100 AS BIGINT) AS rank
        |       FROM nodes CROSS JOIN n LEFT JOIN c1 ON c1.token = nodes.token),
        |c2 AS (SELECT e.dst AS token, CAST(sum(r.rank * e.wt // st.s) AS BIGINT) AS contrib
        |       FROM e JOIN st ON st.src = e.src JOIN r1 r ON r.token = e.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT nodes.token,
        |         CAST((15 * 1000000 // 100) // n_nodes
        |           + 85 * COALESCE(c2.contrib, 0) // 100 AS BIGINT) AS rank
        |       FROM nodes CROSS JOIN n LEFT JOIN c2 ON c2.token = nodes.token)
        |SELECT token, rank FROM r2
        |ORDER BY rank DESC, token LIMIT 30""".stripMargin
  )
}
