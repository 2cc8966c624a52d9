package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation mining — adjacent-token bigrams ranked by pointwise
  * mutual information, the classic corpus-linguistics primitive for
  * surfacing multi-word expressions ("new york", "machine learning")
  * a token-unigram vocabulary misses.
  *
  * PMI = log p(xy) / (p(x)·p(y)) — log is monotone, so the RANKING
  * needs only the lift ratio, which this operator emits as a
  * scaled-integer two-step floor division (each step exact on both
  * engines, no float anywhere):
  *
  *   lift_ppm = ((10⁶ · n_xy) div n_x · N) div n_y
  *
  * with N the total unigram count. The constant N/N_bigrams between
  * this and the true probability ratio is shared by every bigram, so
  * the induced order is the PMI order. Long-range audit: the largest
  * intermediate is ((10⁶·n_xy) div n_x)·N ≤ 10⁶·n_xy·N ≤ 10⁶·N², which
  * fits int64 while N ≤ 3·10⁶ tokens; past that, shrink SCALE or lift
  * the arithmetic to decimal(38,0).
  *
  * 100 TB shape: bigram extraction is a codegen'd `zip_with` over each
  * document's token array (no self-join, no posexplode matching);
  * unigram and bigram counts are map-side-combining aggregates; the
  * count-table joins are token-keyed; the final top-k is a
  * TakeOrdered (per-partition heap + driver merge of k rows), never a
  * global sort.
  */
object Collocations {

  /** Top-`k` adjacent-token bigrams by integer PMI lift over
    * `docs(doc_id, text)`, among bigrams with `minCount` occurrences:
    * (w1, w2, n_xy, n_x, n_y, lift_ppm), ranked (lift desc, w1, w2).
    */
  def pmiBigramsTopK(docs: DataFrame, k: Int, minCount: Int,
                     scale: Long = 1000000L): DataFrame = {
    val toks = docs.select(TextAnalysis.tokens(col("text")).as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
    val ucnt = uni.groupBy(col("w")).agg(count(lit(1)).as("n"))
    val ntot = uni.agg(count(lit(1)).as("n_tot"))
    val bi = toks
      .where(size(col("toks")) >= 2)
      .select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_xy"))
      .where(col("n_xy") >= minCount)
    bi
      .join(ucnt.select(col("w").as("w1"), col("n").as("n_x")), "w1")
      .join(ucnt.select(col("w").as("w2"), col("n").as("n_y")), "w2")
      .crossJoin(broadcast(ntot))
      .select(col("w1"), col("w2"), col("n_xy"), col("n_x"), col("n_y"),
        expr(s"(((($scale * n_xy) div n_x) * n_tot) div n_y)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(k)
  }

  val queries: Map[String, Q] = Map(
    "colloc_pmi_bigrams" -> ((s, dir) =>
      pmiBigramsTopK(Tables.documents(s, dir), k = 100, minCount = 5))
  )

  val oracleSql: Map[String, String] = Map(
    // identical two-step integer arithmetic; bigrams via lateral
    // generate_series over each token list
    "colloc_pmi_bigrams" ->
      """WITH tk AS (
        |  SELECT list_filter(string_split_regex(text, '\s+'), x -> x != '') AS toks
        |  FROM documents),
        |uni AS (SELECT unnest(toks) AS w FROM tk),
        |ucnt AS (SELECT w, count(*) AS n FROM uni GROUP BY w),
        |ntot AS (SELECT count(*) AS n_tot FROM uni),
        |bi AS (
        |  SELECT toks[t.i] AS w1, toks[t.i + 1] AS w2, count(*) AS n_xy
        |  FROM tk, UNNEST(generate_series(1, len(toks) - 1)) AS t(i)
        |  WHERE len(toks) >= 2
        |  GROUP BY 1, 2
        |  HAVING count(*) >= 5)
        |SELECT bi.w1, bi.w2, bi.n_xy, ux.n AS n_x, uy.n AS n_y,
        |  ((((1000000 * bi.n_xy) // ux.n) * ntot.n_tot) // uy.n) AS lift_ppm
        |FROM bi
        |JOIN ucnt ux ON ux.w = bi.w1
        |JOIN ucnt uy ON uy.w = bi.w2
        |CROSS JOIN ntot
        |ORDER BY lift_ppm DESC, bi.w1, bi.w2
        |LIMIT 100""".stripMargin
  )
}
