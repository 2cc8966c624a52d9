package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
  * Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
  * upweight the domains where the proxy model's loss most exceeds the
  * reference, via multiplicative weights — the mixture-planning step
  * between [[BackoffLm]]'s scoring and [[Curriculum]]'s scheduling.
  *
  * Relational lite casting (deterministic, integer-exact): excess loss
  * per source = its mean [[BackoffLm]] token cost minus the global
  * mean, clipped at 0, in millibits/token. Starting uniform (ppm),
  * each of the 3 fixed rounds applies the linearized multiplicative
  * update
  *
  *   u_s  = w_s · (1000 + excess_s) div 1000      (η = 1 per bit)
  *   w′_s = u_s · 10⁶ div Σu                      (renormalize, ppm)
  *
  * — the Bradley–Terry/[[UnigramLm]] fixed-rounds discipline, so the
  * DuckDB oracle replays the identical program as 3 unrolled CTEs.
  * With static excess the iteration moves weight monotonically toward
  * the high-excess domains (the Group-DRO direction); the round count
  * is the knob a recipe tunes. Headroom: w ≤ 10⁶ and excess ≤ ~10⁵ mb
  * (the OOV ceiling), so u ≤ 10⁸, Σu ≤ 10⁸·#sources, and the
  * renormalize numerator u·10⁶ ≤ 10¹⁴ — no BIGINT hazard at any
  * source alphabet a catalog could hold.
  *
  * 100 TB shape: ONE corpus-scoring pass (the probed lm_backoff chain)
  * folded to a #sources-row table; every round after that is
  * arithmetic on the source alphabet with the normalizer broadcast as
  * ONE row (crossJoin(broadcast), never a window) — nothing data-sized
  * appears after the first aggregate.
  */
object Doremi {

  private val Rounds = 3

  /** (source, n_tok, mean_mb, excess_mb, w_ppm) after [[Rounds]]
    * multiplicative-weights rounds.
    */
  def domainWeights(docs: DataFrame): DataFrame = {
    // PERSISTED: every round references the frame twice (the Σu scalar
    // and the next weight table), and without the pin each reference
    // re-evaluates the whole backoff-LM scoring chain — measured 8.7 s
    // → ~2.9 s at sf0.1. #sources rows; released by the harness's
    // per-query clearCache (the round-14 MM/EM-loop convention).
    val perSrc = BackoffLm.tokenCosts(docs)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tok"), sum(col("mbits")).as("total_mb"))
      .persist()
    val glob = perSrc.agg(
      expr("sum(total_mb) div greatest(sum(n_tok), 1L)").as("gmean"),
      count(lit(1)).as("k"))
    var w = perSrc.crossJoin(broadcast(glob))
      .select(col("source"), col("n_tok"),
        expr("total_mb div greatest(n_tok, 1L)").as("mean_mb"),
        expr("greatest(total_mb div greatest(n_tok, 1L) - gmean, 0L)").as("excess_mb"),
        expr("1000000L div k").as("w_ppm"))
    for (_ <- 1 to Rounds) {
      val u = w.withColumn("u", expr("w_ppm * (1000L + excess_mb) div 1000L"))
      val su = u.agg(sum(col("u")).as("su"))
      w = u.crossJoin(broadcast(su))
        .select(col("source"), col("n_tok"), col("mean_mb"), col("excess_mb"),
          expr("u * 1000000L div su").as("w_ppm"))
    }
    w
  }

  val queries: Map[String, Q] = Map(
    "mixture_doremi_weights" -> ((s, dir) =>
      domainWeights(Tables.documents(s, dir)))
  )

  private def roundSql(r: Int): String = {
    val p = if (r == 1) "ex" else s"rw${r - 1}"
    s"""ru$r AS MATERIALIZED (
       |  SELECT source, n_tok, mean_mb, excess_mb,
       |    w * (1000 + excess_mb) // 1000 AS u
       |  FROM $p),
       |rw$r AS (
       |  SELECT source, n_tok, mean_mb, excess_mb,
       |    u * 1000000 // (SELECT sum(u) FROM ru$r) AS w
       |  FROM ru$r)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "mixture_doremi_weights" ->
      (s"""WITH ${BackoffLm.perDocCtes},
          |src AS (
          |  SELECT source, CAST(sum(n_tok) AS BIGINT) AS n_tok,
          |    CAST(sum(total_mbits) AS BIGINT) AS total_mb
          |  -- sources whose docs are all token-less carry no cost rows on
          |  -- the Spark side; HAVING keeps the two alphabets identical
          |  FROM docppl GROUP BY source HAVING sum(n_tok) > 0),
          |g AS (
          |  SELECT CAST(sum(total_mb) // greatest(sum(n_tok), 1) AS BIGINT) AS gmean,
          |    CAST(count(*) AS BIGINT) AS k
          |  FROM src),
          |ex AS (
          |  SELECT s.source, s.n_tok,
          |    CAST(s.total_mb // greatest(s.n_tok, 1) AS BIGINT) AS mean_mb,
          |    CAST(greatest(s.total_mb // greatest(s.n_tok, 1) - g.gmean, 0) AS BIGINT)
          |      AS excess_mb,
          |    CAST(1000000 // g.k AS BIGINT) AS w
          |  FROM src s CROSS JOIN g),
          |""".stripMargin +
        (1 to Rounds).map(roundSql).mkString(",\n") +
        s"\nSELECT source, n_tok, mean_mb, excess_mb, CAST(w AS BIGINT) AS w_ppm FROM rw$Rounds")
  )
}
