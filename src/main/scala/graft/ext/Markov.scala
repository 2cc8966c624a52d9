package graft.ext

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** First-order Markov transition analysis over per-user event streams —
  * the "what happens next" primitive behind next-action prediction,
  * anomaly scoring, and UX flow analysis: P(to | from) for consecutive
  * event pairs, integer-exact (`p_ppm = (10⁶·n_xy) div n_x`), with the
  * per-state top-k next states.
  *
  * 100 TB shape: ONE shuffle on user_id feeds the `lead` window (the
  * sessionize exchange layout — same key, so a composed pipeline reuses
  * it); transition pairs then map-side combine on the (from, to) key,
  * whose cardinality is |event types|² — tiny however large the event
  * log; the denominator table derives from the transition counts (no
  * second pass over the data); the final per-state top-k runs through
  * TopKPerKey's partial/final heap.
  */
object Markov {

  /** Per-from-state top-`k` transitions over `events(user_id, ts_us,
    * event_id, event_type)`: (from_type, rank, to_type, n, p_ppm),
    * ranked by transition probability (ties: higher count first, then
    * to_type).
    */
  def transitionTopK(events: DataFrame, k: Int,
                     scale: Long = 1000000L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(byUser))
      .where(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
    val scored = pairs.join(fromTotals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        expr(s"($scale * n) div n_from").as("p_ppm"))
    graft.plans.TopKPerKey.topKPerKey(scored, Seq("from_type"),
        Seq(("p_ppm", true), ("n", true), ("to_type", false)), k)
      .select(col("from_type"), col("rank"), col("to_type"), col("n"), col("p_ppm"))
  }

  /** Second-order sequential patterns: event-type TRIGRAMS per user
    * stream with a support floor, each scored against its bigram prefix
    * (`cont_ppm` = how often (a,b) continues into c) — the cheap
    * PrefixSpan cut that answers "given the last two actions, what
    * comes third". Same single user-keyed exchange as the bigram
    * operator (both leads ride one window ordering); trigram key
    * cardinality ≤ |types|³, map-side combined.
    */
  def trigramPatterns(events: DataFrame, minSupport: Long,
                      scale: Long = 1000000L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val tri = events
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("event_type").as("a"))
      .withColumn("b", lead(col("a"), 1).over(byUser))
      .withColumn("c", lead(col("a"), 2).over(byUser))
      .where(col("c").isNotNull)
      .groupBy(col("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("n"))
    val prefix = tri.groupBy(col("a"), col("b")).agg(sum(col("n")).as("n_prefix"))
    tri.join(prefix, Seq("a", "b"))
      .where(col("n") >= minSupport)
      .select(col("a"), col("b"), col("c"), col("n"), col("n_prefix"),
        expr(s"($scale * n) div n_prefix").as("cont_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "markov_transitions" -> ((s, dir) =>
      transitionTopK(Tables.events(s, dir), k = 5)),
    "session_trigrams" -> ((s, dir) =>
      trigramPatterns(Tables.events(s, dir), minSupport = 5))
  )

  val oracleSql: Map[String, String] = Map(
    "markov_transitions" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
        |  FROM events),
        |p0 AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS to_type
        |  FROM e),
        |pairs AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM p0 WHERE to_type IS NOT NULL
        |  GROUP BY from_type, to_type),
        |tot AS (SELECT from_type, sum(n) AS n_from FROM pairs GROUP BY from_type),
        |scored AS (
        |  SELECT p.from_type, p.to_type, p.n,
        |    (1000000 * p.n) // t.n_from AS p_ppm
        |  FROM pairs p JOIN tot t ON t.from_type = p.from_type)
        |SELECT from_type,
        |  CAST(row_number() OVER (PARTITION BY from_type
        |    ORDER BY p_ppm DESC, n DESC, to_type) AS INTEGER) AS rank,
        |  to_type, n, CAST(p_ppm AS BIGINT) AS p_ppm
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY from_type
        |  ORDER BY p_ppm DESC, n DESC, to_type) <= 5""".stripMargin,

    "session_trigrams" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
        |  FROM events),
        |t0 AS (
        |  SELECT event_type AS a,
        |    lead(event_type, 1) OVER w AS b,
        |    lead(event_type, 2) OVER w AS c
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |tri AS (
        |  SELECT a, b, c, count(*) AS n
        |  FROM t0 WHERE c IS NOT NULL GROUP BY a, b, c),
        |prefix AS (
        |  SELECT a, b, CAST(sum(n) AS BIGINT) AS n_prefix
        |  FROM tri GROUP BY a, b)
        |SELECT t.a, t.b, t.c, t.n, p.n_prefix,
        |  (1000000 * t.n) // p.n_prefix AS cont_ppm
        |FROM tri t JOIN prefix p ON p.a = t.a AND p.b = t.b
        |WHERE t.n >= 5""".stripMargin
  )
}
