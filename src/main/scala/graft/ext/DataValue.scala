package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data valuation by leave-one-source-out perplexity — the "what does
  * this source teach the model that the rest of the corpus doesn't"
  * readout behind data-mixture pruning decisions (the cheap, exact
  * stand-in for Shapley-style valuation a 100 TB pipeline can actually
  * afford). For each source s, score s's tokens under the bigram
  * backoff model trained on EVERYTHING EXCEPT s, beside the full-model
  * score; the uplift (LOO − full, in millibits/token) is high exactly
  * when s's content is unique (removing it degrades the model ON s)
  * and ~0 when s is redundant with the rest.
  *
  * The trick that makes K leave-one-out models ONE relational program:
  * count subtraction. A LOO model's counts are the global counts minus
  * the source's own contribution — n_uv−n_uv_s, n_ctx−n_ctx_s,
  * n_v−n_v_s, N−N_s — so no model is ever trained twice, and because
  * the [[BackoffLm]] cost depends only on the (u, v) type and the
  * scoring source, the whole computation collapses onto the
  * (bigram-type × source) table with each row carrying its occurrence
  * count as a weight: cost evaluated once per type, never per token.
  *
  * 100 TB shape: one corpus pass (the pair explode + the
  * (u,v,source)-keyed aggregate, map-side combined); every join after
  * that rides bigram-TYPE tables (Heaps-sublinear × #sources) on
  * (u,v)/(u,s)/(v,s) keys; the per-source token totals are a
  * #sources-row broadcast; the global N is a 1-row broadcast. Integer
  * millibits throughout ([[NbFilter.mlog2]]), so the DuckDB oracle
  * replays every score bit for bit.
  */
object DataValue {

  private def mlog2(x: String) = NbFilter.mlog2(x)

  /** Per-source LOO valuation: (source, n_tok, mean_full_mb,
    * mean_loo_mb, uplift_mb).
    */
  def looSourceValue(docs: DataFrame): DataFrame = {
    val p = BackoffLm.pairs(docs)
    // the (bigram-type × source) table — each row weighted by its count
    val bgs = p.groupBy(col("u"), col("v"), col("source"))
      .agg(count(lit(1)).as("m"))
      .persist()
    val bgTot = bgs.groupBy(col("u"), col("v")).agg(sum(col("m")).as("n_uv"))
    val ctxS = bgs.groupBy(col("u"), col("source")).agg(sum(col("m")).as("n_ctx_s"))
    val ctxTot = bgs.groupBy(col("u")).agg(sum(col("m")).as("n_ctx"))
    val uniS = bgs.groupBy(col("v"), col("source")).agg(sum(col("m")).as("n_v_s"))
    val uniTot = bgs.groupBy(col("v")).agg(sum(col("m")).as("n_v"))
    val nS = bgs.groupBy(col("source")).agg(sum(col("m")).as("n_s"))
    val nTot = bgs.agg(sum(col("m")).as("n_all"))

    val scored = bgs
      .join(bgTot, Seq("u", "v"))
      .join(ctxTot, Seq("u"))
      .join(ctxS, Seq("u", "source"))
      .join(uniTot, Seq("v"))
      .join(uniS, Seq("v", "source"))
      .join(broadcast(nS), Seq("source"))
      .crossJoin(broadcast(nTot))
      // LOO counts: global minus the scoring source's own contribution.
      // ctx_s/uni_s joins are inner and complete by construction (the
      // row's own occurrences guarantee membership).
      .withColumn("uv_loo", col("n_uv") - col("m"))
      .withColumn("ctx_loo", col("n_ctx") - col("n_ctx_s"))
      .withColumn("v_loo", col("n_v") - col("n_v_s"))
      .withColumn("nn_loo", expr("greatest(n_all - n_s, 1L)"))
      .select(col("source"), col("m"),
        // full-model cost (every count > 0: the pair occurs)
        (mlog2("n_ctx") - mlog2("n_uv")).cast("long").as("full_mb"),
        when(col("uv_loo") > 0, mlog2("ctx_loo") - mlog2("uv_loo"))
          .when(col("v_loo") > 0, lit(1000L) + mlog2("nn_loo") - mlog2("v_loo"))
          .otherwise(lit(2000L) + mlog2("nn_loo")).cast("long").as("loo_mb"))
    scored.groupBy(col("source"))
      .agg(sum(col("m")).as("n_tok"),
        sum(expr("m * full_mb")).as("tf"),
        sum(expr("m * loo_mb")).as("tl"))
      .select(col("source"), col("n_tok"),
        expr("tf div n_tok").as("mean_full_mb"),
        expr("tl div n_tok").as("mean_loo_mb"),
        expr("tl div n_tok - tf div n_tok").as("uplift_mb"))
  }

  val queries: Map[String, Q] = Map(
    "lm_loo_source_value" -> ((s, dir) =>
      looSourceValue(Tables.documents(s, dir)))
  )

  private def mlog2Duck(x: String): String = NbFilter.mlog2DuckSql(x)

  val oracleSql: Map[String, String] = Map(
    "lm_loo_source_value" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source,
         |    list_filter(string_split_regex(text, '\\s+'), x -> x != '') AS t
         |  FROM documents),
         |pairs AS MATERIALIZED (
         |  SELECT doc_id, source, p.u AS u, p.v AS v FROM (
         |    SELECT doc_id, source,
         |      unnest(list_transform(generate_series(1, len(t)), i ->
         |        struct_pack(u := CASE WHEN i = 1 THEN chr(1) ELSE t[i-1] END,
         |                    v := t[i]))) AS p
         |    FROM toks WHERE len(t) >= 1)),
         |bgs AS MATERIALIZED (
         |  SELECT u, v, source, CAST(count(*) AS BIGINT) AS m
         |  FROM pairs GROUP BY u, v, source),
         |bgt AS (SELECT u, v, CAST(sum(m) AS BIGINT) AS n_uv FROM bgs GROUP BY u, v),
         |cxs AS (SELECT u, source, CAST(sum(m) AS BIGINT) AS n_ctx_s FROM bgs GROUP BY u, source),
         |cxt AS (SELECT u, CAST(sum(m) AS BIGINT) AS n_ctx FROM bgs GROUP BY u),
         |uns AS (SELECT v, source, CAST(sum(m) AS BIGINT) AS n_v_s FROM bgs GROUP BY v, source),
         |unt AS (SELECT v, CAST(sum(m) AS BIGINT) AS n_v FROM bgs GROUP BY v),
         |ns AS (SELECT source, CAST(sum(m) AS BIGINT) AS n_s FROM bgs GROUP BY source),
         |nt AS (SELECT CAST(sum(m) AS BIGINT) AS n_all FROM bgs),
         |sc AS (
         |  SELECT b.source, b.m,
         |    CAST(${mlog2Duck("cxt.n_ctx")} - ${mlog2Duck("bgt.n_uv")} AS BIGINT) AS full_mb,
         |    CAST(CASE
         |      WHEN bgt.n_uv - b.m > 0
         |        THEN ${mlog2Duck("cxt.n_ctx - cxs.n_ctx_s")} - ${mlog2Duck("bgt.n_uv - b.m")}
         |      WHEN unt.n_v - uns.n_v_s > 0
         |        THEN 1000 + ${mlog2Duck("greatest(nt.n_all - ns.n_s, 1)")}
         |             - ${mlog2Duck("unt.n_v - uns.n_v_s")}
         |      ELSE 2000 + ${mlog2Duck("greatest(nt.n_all - ns.n_s, 1)")}
         |    END AS BIGINT) AS loo_mb
         |  FROM bgs b
         |  JOIN bgt ON bgt.u = b.u AND bgt.v = b.v
         |  JOIN cxt ON cxt.u = b.u
         |  JOIN cxs ON cxs.u = b.u AND cxs.source = b.source
         |  JOIN unt ON unt.v = b.v
         |  JOIN uns ON uns.v = b.v AND uns.source = b.source
         |  JOIN ns ON ns.source = b.source
         |  CROSS JOIN nt)
         |SELECT source, CAST(sum(m) AS BIGINT) AS n_tok,
         |  CAST(sum(m * full_mb) // sum(m) AS BIGINT) AS mean_full_mb,
         |  CAST(sum(m * loo_mb) // sum(m) AS BIGINT) AS mean_loo_mb,
         |  CAST(sum(m * loo_mb) // sum(m) - sum(m * full_mb) // sum(m) AS BIGINT)
         |    AS uplift_mb
         |FROM sc GROUP BY source""".stripMargin
  )
}
