package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic Poisson bootstrap — the bootstrap variant that
  * actually distributes (Chamandy et al., "Estimating Uncertainty for
  * Massive Data Streams", Google 2012): instead of resampling n rows
  * WITH replacement (which needs global coordination), each row enters
  * replicate b with an independent Poisson(1) weight, preserving the
  * bootstrap's first- and second-order properties while needing only
  * a per-row hash draw.
  *
  * Here the Poisson(1) draw is md5-DETERMINISTIC (the engine-portable
  * "random" used by [[Sampling]]): the first 8 hex digits of
  * `md5(id:b)` form a uniform 32-bit integer, inverted through the
  * Poisson(1) CDF with PINNED integer thresholds (⌊cdf·2³²⌋ for
  * k = 0..4, clamped at 5 — covering 1−3e−4 of the mass). Identical
  * arithmetic in the oracle, so every replicate mean is hash-exact.
  *
  * 100 TB shape: the per-row explode to B replicates is map-side only;
  * partial aggregation reduces it to B·partitions shuffle rows, so the
  * exchange carries ~B rows per task regardless of data size. The
  * replicate table (B rows) is what crosses to the driver/consumer —
  * quantiles over it give the CI.
  */
object Bootstrap {

  /** Poisson(1) CDF thresholds on the 2³² grid: P(X≤k) for k=0..4. */
  private val thresholds = Seq(
    1580030169L, // ⌊e⁻¹·2³²⌋+1 boundary for k=0
    3160060338L, // k ≤ 1
    3950097922L, // k ≤ 2
    4213443784L, // k ≤ 3
    4279280149L  // k ≤ 4
  )

  /** (b, n_eff, mean_cents) for `reps` replicates: each replicate's
    * Poisson-weighted mean of `valueCol` (integer cents, truncating
    * div). `idCol` must be unique per row.
    */
  def poissonBootstrapMeans(data: DataFrame, idCol: String,
                            valueCol: String, reps: Int = 100): DataFrame = {
    val w = thresholds.zipWithIndex.foldRight(lit(5L)) {
      case ((t, k), rest) => when(col("_h") < t, k.toLong).otherwise(rest)
    }
    data.select(col(idCol).as("_id"), col(valueCol).as("_v"))
      .withColumn("b", explode(sequence(lit(0), lit(reps - 1))))
      .withColumn("_h",
        expr("conv(substring(md5(concat(cast(_id AS STRING), ':', cast(b AS STRING))), 1, 8), 16, 10)")
          .cast("long"))
      .withColumn("_w", w)
      .groupBy(col("b"))
      .agg(sum(col("_w")).as("n_eff"),
        sum(col("_w") * col("_v")).as("_s"))
      .select(col("b"), col("n_eff"),
        expr("_s div greatest(n_eff, 1L)").as("mean_cents"))
  }

  val queries: Map[String, Q] = Map(
    // 100 bootstrap replicates of mean purchase value — the replicate
    // table whose 5th/95th percentiles are the CI a dashboard shows
    "bootstrap_poisson_means" -> ((s, dir) =>
      poissonBootstrapMeans(
        Tables.events(s, dir).where(col("event_type") === "purchase")
          .select(col("event_id"),
            round(col("value") * 100).cast("long").as("cents")),
        "event_id", "cents", reps = 100))
  )

  val oracleSql: Map[String, String] = Map(
    "bootstrap_poisson_means" ->
      """WITH v AS (
        |  SELECT event_id, CAST(round(value*100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |x AS (
        |  SELECT b, cents,
        |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':' ||
        |      CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) AS h
        |  FROM v, UNNEST(generate_series(0, 99)) AS t(b)),
        |w AS (
        |  SELECT b, cents,
        |    CASE WHEN h < 1580030169 THEN 0
        |         WHEN h < 3160060338 THEN 1
        |         WHEN h < 3950097922 THEN 2
        |         WHEN h < 4213443784 THEN 3
        |         WHEN h < 4279280149 THEN 4
        |         ELSE 5 END AS wt
        |  FROM x)
        |SELECT b, CAST(sum(wt) AS BIGINT) AS n_eff,
        |  CAST(sum(wt * cents) AS BIGINT) // greatest(CAST(sum(wt) AS BIGINT), 1)
        |    AS mean_cents
        |FROM w GROUP BY b""".stripMargin
  )
}
