package graft.streaming

import graft.Q
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.11 — absent in the strictly
  * batch reference, added for the extended engine): the same event-time
  * windowed aggregation as `event_window_agg`, expressed as
  * `readStream → watermark → window → writeStream`.
  *
  * Micro-batch execution incrementalizes the aggregation: state is keyed
  * by (window, event_type) and pruned by the watermark, so unbounded
  * streams run in bounded memory — the streaming analogue of map-side
  * partial aggregation.
  */
object StreamingOps {

  /** Streaming events source normalized to exact micros `ts_us`,
    * schema-adaptive the same way [[graft.Tables.events]] is: a file
    * stream cannot infer its schema, so the BATCH reader footer-sniffs
    * the actual `ts` physical type (raw nanos long vs `timestamp[us]`)
    * and the declared stream schema + micros derivation follow it. The
    * one-file footer read happens at plan time, not per micro-batch.
    */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read
      .option("pathGlobFilter", "events.parquet").parquet(dir).schema
    val raw = spark.readStream
      .schema(fileSchema)
      .option("pathGlobFilter", "events.parquet") // file source needs a dir
      .parquet(dir)
    fileSchema("ts").dataType match {
      case LongType => raw.withColumn("ts_us", expr("ts div 1000"))
      case TimestampType | TimestampNTZType =>
        raw.withColumn("ts_us", // session tz is pinned UTC → exact
          unix_micros(col("ts").cast(TimestampType)))
      case other => // fail loudly, mirroring Tables.events
        throw new IllegalArgumentException(
          s"events.ts: unsupported physical type $other — expected legacy " +
            "nanos LongType or timestamp[us] (NTZ/LTZ)")
    }
  }

  /** Streaming hourly counts per event type. `withWatermark` bounds state;
    * emitted results are compared against the batch oracle in
    * complete-output mode.
    */
  def hourlyCountsStream(spark: SparkSession, dir: String): DataFrame = {
    eventsStream(spark, dir)
      .withColumn("ts_event", timestamp_micros(col("ts_us")))
      .withWatermark("ts_event", "1 hour")
      .groupBy(window(col("ts_event"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"))
  }

  /** Streaming APPROXIMATE-DISTINCT windows: per hourly window per
    * event type, event count + HLL distinct-user estimate via the
    * custom [[graft.functions.HllSketchAgg]] running INSIDE a streaming
    * aggregation — the sketch's home turf, because Structured Streaming
    * does not support exact distinct aggregation at all (state would be
    * unbounded per group); a 4 KiB register set per window is the
    * standard fix.
    *
    * Oracle strategy (the hll_rollup_check pattern): HLL registers are
    * deterministic in the value set, so the STREAMED estimate must
    * EQUAL the batch estimate over the same rows — pinned as an exact
    * boolean — and sit within max(5%, ±5) of the exact count. The
    * absolute floor is sized for the FLEET of window cells, not one
    * cell: small windows estimate by linear counting, whose error is
    * the register-collision count c ~ Poisson(n²/2m) — at n≈30,
    * m=4096, P(c ≥ 3) ≈ 2e-4 per cell, so across the ~3k
    * (window, type) cells of a sf0.1 run ONE 3-collision cell is
    * expected (union bound) and a ±2 floor fails it; P(c ≥ 6) ≈ 2e-9
    * keeps ±5 safe past 10⁵ cells. The oracle reproduces the exact
    * counts and pins both booleans TRUE.
    */
  def hllWindowToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val name = s"shll_${System.nanoTime()}"
    val q = eventsStream(spark, dir)
      .withColumn("ts_event", timestamp_micros(col("ts_us")))
      .withWatermark("ts_event", "1 hour")
      .groupBy(window(col("ts_event"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.HllSketchAgg.hllDistinct(col("user_id"), 12).as("est_users"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("est_users"))
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table(name)
    // Tables.events already exposes `ts` as TIMESTAMP (from the raw
    // nanos long), so the batch replay windows it directly
    val batch = graft.Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        graft.functions.HllSketchAgg.hllDistinct(col("user_id"), 12).as("batch_est"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("exact_users"), col("batch_est"))
    streamed.join(batch, Seq("window_start_us", "event_type"))
      .select(col("window_start_us"), col("event_type"), col("n_events"),
        col("exact_users"),
        (col("est_users") === col("batch_est")).as("stream_eq_batch_sketch"),
        (abs(col("est_users") - col("exact_users")) <=
          greatest(ceil(col("exact_users") * lit(0.05)), lit(5L))).as("within_bound"))
  }

  /** Run the stream to completion against the static parquet and return
    * the final result (memory sink, complete mode).
    */
  def runToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val name = s"stream_out_${System.nanoTime()}"
    val q = hourlyCountsStream(spark, dir)
      .writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }

  /** Streaming top-k: the windowed counts accumulate INCREMENTALLY in
    * the streaming aggregation's state (complete mode); the per-window
    * top-3 rank is a BATCH finisher over the window×type result table —
    * ranking inside a streaming agg is unsupported by design (a rank is
    * not incrementally maintainable without retraction), so the correct
    * production shape is exactly this: stream maintains the monoid
    * (counts), the consumer ranks the tiny aggregate. Deterministic
    * tie-break (n desc, event_type).
    */
  def topkWindowToCompletion(spark: SparkSession, dir: String,
                             k: Int = 3): DataFrame = {
    val name = s"stream_topk_${System.nanoTime()}"
    val q = hourlyCountsStream(spark, dir)
      .writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start_us"))
      .orderBy(col("n").desc, col("event_type"))
    spark.table(name)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("window_start_us"), col("rk").cast("long").as("rk"),
        col("event_type"), col("n"))
  }

  final case class Ev(user_id: Long, ts_us: Long, value: Double)
  final case class JoinEv(user_id: Long, event_id: Long, ts_us: Long)
  final case class SessionState(start_us: Long, last_us: Long, n: Long,
                                cents: Long, seq: Long)
  final case class Session(user_id: Long, session_id: Long,
                           session_start_us: Long, session_end_us: Long,
                           n_events: Long, value_cents: Long)

  /** `round(value * 100)` exactly as the batch path computes it —
    * Spark's Round on DoubleType goes through `BigDecimal.valueOf`
    * with HALF_UP, which differs from `math.round` on negative
    * half-cents.
    */
  private def cents(value: Double): Long =
    java.math.BigDecimal.valueOf(value * 100)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Stateful streaming sessionization: custom per-user state via
    * `flatMapGroupsWithState` (the engine's §2.12 stateful extension
    * point). A session closes when the user's event-time gap exceeds
    * `gapUs` OR the state times out on the event-time clock (watermark) —
    * so state is bounded even for users that go silent.
    *
    * Emits the batch `sessionize` schema: the state carries the session
    * ordinal (`seq`) and the exact integer-cents sum alongside the
    * bounds, so a run whose final watermark passes every timeout (see
    * [[sessionizeToCompletion]]) reproduces the batch result
    * bit-for-bit. `(user_id, ts_us)` is unique in the events table, so
    * the per-batch sort on `ts_us` is total and ordinals are
    * deterministic.
    *
    * Batch-parity contract: each user's events must be delivered in
    * event-time order ACROSS micro-batches (within a batch the operator
    * sorts). The run-to-completion harness satisfies this trivially —
    * all data arrives in one batch. In a live multi-batch stream, two
    * incremental limits apply that any append-mode sessionizer shares:
    * a late-but-admissible event older than the open session cannot
    * retroactively merge ALREADY-EMITTED sessions, and a user resuming
    * after an event-time timeout restarts the ordinal (state, including
    * `seq`, was dropped at timeout — keeping it would make state
    * user-cardinality-bounded instead of watermark-bounded).
    */
  def sessionizeStream(events: Dataset[Ev], gapUs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts_event", timestamp_micros(col("ts_us")))
      .withWatermark("ts_event", "1 hour")
      .as[(Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[(Long, Long, Double, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.seq, s.start_us, s.last_us, s.n, s.cents))
          } else {
            val sorted = evs.map(t => (t._2, t._3)).toArray.sortBy(_._1)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { case (ts, v) =>
              cur match {
                case Some(s) if ts - s.last_us <= gapUs =>
                  cur = Some(s.copy(last_us = ts, n = s.n + 1, cents = s.cents + cents(v)))
                case Some(s) =>
                  closed ::= Session(user, s.seq, s.start_us, s.last_us, s.n, s.cents)
                  cur = Some(SessionState(ts, ts, 1, cents(v), s.seq + 1))
                case None =>
                  cur = Some(SessionState(ts, ts, 1, cents(v), 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Spark rejects timeout timestamps at or before the current
              // watermark — a late-but-admissible event (event time older
              // than watermark minus gap) would otherwise crash the query
              state.setTimeoutTimestamp(
                math.max(s.last_us / 1000 + gapUs / 1000,
                  state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
  }

  /** Sentinel timestamp far past any event (year 3000) used to flush
    * open sessions at end-of-input.
    */
  val FlushTsUs: Long = 32503680000000000L

  /** Run the sessionization stream over the static events parquet TO
    * COMPLETION: the parquet streams in via the file source, then two
    * far-future sentinel rows (user −1) injected through a unioned
    * MemoryStream push the watermark past every real session's timeout,
    * so `flatMapGroupsWithState` emits the open tails through its
    * timeout path. The emitted set (sentinel user filtered out) then
    * EQUALS the batch `sessionize` result — which is exactly what the
    * shared DuckDB oracle checks. Two sentinels because a watermark
    * advanced at the end of batch N fires timeouts during batch N+1:
    * the first raises the watermark, the second triggers the batch that
    * drains the timed-out state.
    */
  def sessionizeToCompletion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // per-user state is keyed-stream-sized: pin the stateful shuffle
    // width to the stream, not the batch-scan default — every
    // micro-batch (three run here) commits one state store per
    // partition, which dominates the harness cost at width 32. Scoped
    // exactly like streaming_join's override.
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val sentinels =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
      val fileSrc = eventsStream(spark, dir)
        .select(col("user_id"), col("ts_us"), col("value"))
        .as[Ev]
      val name = s"sessions_${System.nanoTime()}"
      val q = sessionizeStream(fileSrc.union(sentinels.toDS()),
          graft.ext.Sessionize.SessionGapUs)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        // the first sentinel rides in the same micro-batch as the file
        // data: the watermark only advances AFTER a batch, so no file
        // event is late, and the batch's end-of-batch watermark already
        // clears every real session's timeout — one fewer batch than
        // sentinel-after-flush
        sentinels.addData(Ev(-1L, FlushTsUs, 0.0))
        q.processAllAvailable()
        sentinels.addData(Ev(-1L, FlushTsUs + 2 * graft.ext.Sessionize.SessionGapUs, 0.0))
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name).filter(col("user_id") >= 0)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  final case class FunnelEv(user_id: Long, event_type: String, ts_us: Long)

  /** Streaming funnel state: the running min of step-1 timestamps plus
    * CANDIDATE timestamp buffers for each later step. Candidates must be
    * buffered (unlike sessionize's O(1) state) because a late step-1
    * event can move the chain's windows in either direction, re-
    * qualifying or disqualifying any later-step event — the chain is
    * only decidable when the user's horizon closes. State is bounded by
    * the user's step-2..k event count inside the stream horizon and is
    * dropped wholesale at the timeout that emits the row.
    */
  final case class FunnelBuf(t1: Long, tails: Seq[Seq[Long]])

  final case class FunnelRow(user_id: Long, t1_us: Long,
                             t2_us: Option[Long], t3_us: Option[Long],
                             steps: Int)

  /** Stateful ordered funnel — the streaming form of
    * [[graft.ext.Sessionize.funnelSteps]] (same earliest-completion
    * semantics, same output schema, SAME exact oracle). Events
    * accumulate per user; the finalized chain — each step's first match
    * strictly after the previous step's match and within `windowUs` —
    * is emitted exactly once, through the event-time timeout path after
    * the watermark passes the flush sentinel.
    */
  def funnelStream(events: Dataset[FunnelEv], stepTypes: Seq[String],
                   windowUs: Long): Dataset[FunnelRow] = {
    require(stepTypes.size == 3, "FunnelRow is the 3-step shape")
    import events.sparkSession.implicits._
    events
      .withColumn("ts_event", timestamp_micros(col("ts_us")))
      .withWatermark("ts_event", "1 hour")
      .as[(Long, String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelBuf, FunnelRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[(Long, String, Long, java.sql.Timestamp)],
         state: GroupState[FunnelBuf]) =>
          if (state.hasTimedOut) {
            val b = state.get
            state.remove()
            if (b.t1 == Long.MaxValue) Iterator.empty
            else {
              // fold the chain: first candidate strictly after the
              // previous match and within the window of it
              val matches = b.tails.scanLeft(Option(b.t1)) { (prev, cands) =>
                prev.flatMap(p =>
                  cands.sorted.find(ts => ts > p && ts <= p + windowUs))
              }.tail
              Iterator.single(FunnelRow(user, b.t1,
                matches.head, matches(1),
                1 + matches.count(_.isDefined)))
            }
          } else {
            var b = state.getOption.getOrElse(
              FunnelBuf(Long.MaxValue, stepTypes.tail.map(_ => Vector.empty[Long])))
            evs.foreach { case (_, tpe, ts, _) =>
              if (tpe == stepTypes.head) {
                if (ts < b.t1) b = b.copy(t1 = ts)
              } else {
                val i = stepTypes.tail.indexOf(tpe)
                if (i >= 0) b = b.copy(tails = b.tails.updated(i, b.tails(i) :+ ts))
              }
            }
            state.update(b)
            // fire on the first batch whose end-of-batch watermark has
            // moved past this one — the sentinel flush batch
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
            Iterator.empty
          }
      }
  }

  /** Run the funnel stream over the static events parquet to
    * completion — same sentinel-driven flush as
    * [[sessionizeToCompletion]] (two far-future sentinel rows advance
    * the watermark, firing every user's timeout), same scoped
    * shuffle-width override.
    */
  def funnelToCompletion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val sentinels =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[FunnelEv]
      val fileSrc = eventsStream(spark, dir)
        .select(col("user_id"), col("event_type"), col("ts_us"))
        .as[FunnelEv]
      val name = s"funnel_${System.nanoTime()}"
      val q = funnelStream(fileSrc.union(sentinels.toDS()),
          Seq("view", "click", "purchase"), 86400000000L)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        sentinels.addData(FunnelEv(-1L, "view", FlushTsUs))
        q.processAllAvailable()
        sentinels.addData(FunnelEv(-1L, "view", FlushTsUs + 7200000000L))
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name).filter(col("user_id") >= 0)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  final case class CusumEv(event_type: String, event_id: Long, ts_us: Long,
                           cents: Long)

  final case class CusumRow(event_type: String, event_id: Long, ts_us: Long,
                            cusum_pos: Long, cusum_neg: Long)

  /** Stateful streaming CUSUM — the streaming form of
    * [[graft.ext.Timeseries.cusum]] with the SAME exact oracle: per-key
    * event buffers in `flatMapGroupsWithState`, the full two-sided
    * curve emitted once the watermark passes the sentinel flush.
    *
    * The buffer is inherent to the SEMANTICS, not a shortcut: this
    * detector centers on the stream's own mean (dᵢ = n·xᵢ − Σx), which
    * no prefix of the stream determines, and the curve is order-
    * sensitive while file/stream arrival order is not event-time order
    * — so the horizon must close before any row is final. The O(1)-
    * state variant exists when BOTH relaxations hold (a FIXED reference
    * instead of the stream mean, in-order delivery): then the textbook
    * recursion S⁺ᵢ = max(0, S⁺ᵢ₋₁ + dᵢ) runs directly in the state
    * cell. Production monitors usually accept that pair; the harness
    * query keeps the exact-oracle form.
    */
  def cusumStream(events: Dataset[CusumEv]): Dataset[CusumRow] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts_event", timestamp_micros(col("ts_us")))
      .withWatermark("ts_event", "1 hour")
      .as[(String, Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Vector[(Long, Long, Long)], CusumRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, evs: Iterator[(String, Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[Vector[(Long, Long, Long)]]) =>
          if (state.hasTimedOut) {
            val buf = state.get
            state.remove()
            val sorted = buf.sortBy { case (id, ts, _) => (ts, id) }
            val n = sorted.size.toLong
            val total = sorted.iterator.map(_._3).sum
            var p = 0L; var minp = 0L; var maxp = 0L
            sorted.iterator.map { case (id, ts, c) =>
              p += n * c - total
              minp = math.min(minp, p); maxp = math.max(maxp, p)
              CusumRow(key, id, ts, p - math.min(0L, minp), math.max(0L, maxp) - p)
            }
          } else {
            val buf = state.getOption.getOrElse(Vector.empty) ++
              evs.map { case (_, id, ts, c, _) => (id, ts, c) }
            state.update(buf)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
            Iterator.empty
          }
      }
  }

  /** Run the CUSUM stream over the static events parquet to completion
    * — the sentinel-flush harness of [[funnelToCompletion]].
    */
  def cusumToCompletion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val sentinels =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[CusumEv]
      val fileSrc = eventsStream(spark, dir)
        .select(col("event_type"), col("event_id"), col("ts_us"),
          round(col("value") * 100).cast("long").as("cents"))
        .as[CusumEv]
      val name = s"cusum_${System.nanoTime()}"
      val q = cusumStream(fileSrc.union(sentinels.toDS()))
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        sentinels.addData(CusumEv("\u0000flush", -1L, FlushTsUs, 0L))
        q.processAllAvailable()
        sentinels.addData(CusumEv("\u0000flush", -2L, FlushTsUs + 7200000000L, 0L))
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name).filter(col("event_id") >= 0)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  final case class CusumUserEv(user_id: Long, event_id: Long, ts_us: Long,
                               cents: Long)

  final case class CusumUserRow(user_id: Long, event_id: Long, ts_us: Long,
                                cusum_pos: Long, cusum_neg: Long)

  /** Per-USER stateful streaming CUSUM — the keys-scaled face of
    * [[cusumStream]]: state cardinality rides the user population
    * (what a production deployment grows in) while each key's buffer
    * is one user's bounded history. The probe pair (streaming_cusum =
    * depth-scaled, this = keys-scaled) pins the depth-vs-keys
    * decomposition of the cusum family's scale curve.
    */
  def cusumStreamByUser(events: Dataset[CusumUserEv]): Dataset[CusumUserRow] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts_event", timestamp_micros(col("ts_us")))
      .withWatermark("ts_event", "1 hour")
      .as[(Long, Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Vector[(Long, Long, Long)], CusumUserRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, evs: Iterator[(Long, Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[Vector[(Long, Long, Long)]]) =>
          if (state.hasTimedOut) {
            val buf = state.get
            state.remove()
            val sorted = buf.sortBy { case (id, ts, _) => (ts, id) }
            val n = sorted.size.toLong
            val total = sorted.iterator.map(_._3).sum
            var p = 0L; var minp = 0L; var maxp = 0L
            sorted.iterator.map { case (id, ts, c) =>
              p += n * c - total
              minp = math.min(minp, p); maxp = math.max(maxp, p)
              CusumUserRow(key, id, ts, p - math.min(0L, minp), math.max(0L, maxp) - p)
            }
          } else {
            val buf = state.getOption.getOrElse(Vector.empty) ++
              evs.map { case (_, id, ts, c, _) => (id, ts, c) }
            state.update(buf)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
            Iterator.empty
          }
      }
  }

  /** Run the per-user CUSUM stream over the static events parquet to
    * completion — the sentinel-flush harness of [[cusumToCompletion]]
    * (sentinel user −1, its flush rows dropped by the event_id filter).
    */
  def cusumByUserToCompletion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sentinels =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[CusumUserEv]
    val fileSrc = eventsStream(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[CusumUserEv]
    val name = s"cusum_user_${System.nanoTime()}"
    val q = cusumStreamByUser(fileSrc.union(sentinels.toDS()))
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      sentinels.addData(CusumUserEv(-1L, -1L, FlushTsUs, 0L))
      q.processAllAvailable()
      sentinels.addData(CusumUserEv(-1L, -2L, FlushTsUs + 7200000000L, 0L))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).filter(col("event_id") >= 0)
  }

  private val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** SLIDING-window streaming counts — the streaming face of the batch
    * `event_sliding_window`: same `window(ts, "1 hour", "30 minutes")`
    * generator, each event in 2 overlapping windows. Complete output
    * mode is the run-to-completion harness's choice so the final table
    * equals the batch oracle; a live deployment runs append mode where
    * the watermark retires each window 1 hour after it closes, keeping
    * state at (width/slide)·active-windows regardless of stream length.
    */
  def slidingCountsToCompletion(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val name = s"slide_out_${System.nanoTime()}"
    // stateful aggregation: pin the state-store width to the keyed
    // stream, not the batch-scan default — the same scoped override
    // discipline as the sibling stateful harnesses
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = eventsStream(spark, dir)
        .withColumn("ts_event", timestamp_micros(col("ts_us")))
        .withWatermark("ts_event", "1 hour")
        .groupBy(col("event_type"),
          window(col("ts_event"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"))
        .select(col("event_type"),
          unix_micros(col("window.start")).as("window_start_us"),
          col("n"), col("value_cents"))
        .writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      spark.table(name)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  private val ordersSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType)))

  /** Streaming replica digest — [[graft.ops.Checksum.bucketDigest]]'s
    * streaming twin, sharing its EXACT oracle: the per-row (bucket, h)
    * projection is the shared [[graft.ops.Checksum.hashedRows]], and
    * the combiner is BIT_XOR — whose order/merge-invariance is
    * precisely WHY the incremental micro-batch fold must equal the
    * batch digest bit-for-bit (a sum-based digest would only agree up
    * to overflow; XOR agrees algebraically). Complete-mode streaming
    * aggregation, 64 rows of state total, watermark-free (digests
    * never expire).
    */
  def checksumStream(spark: SparkSession, dir: String): DataFrame = {
    val name = s"ckstream_${System.nanoTime()}"
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    // Round-11 adjudication of the 3.1×@10× probe curve: per-task
    // metrics showed ONE of the scan tasks doing all the work — the
    // scaled single-file input had been written as a SINGLE PARQUET ROW
    // GROUP, and parquet splits are row-group-aligned, so no split
    // setting can parallelize it (a 4 MB maxPartitionBytes override was
    // tried and measured no change before the row-group count was
    // checked). The operator is sound; the probe INPUT was the
    // serializer — ScaleProbe now writes its single-file tables with
    // 8 MB row groups. At 100 TB inputs are many files/row groups and
    // the default splitting parallelizes the scan on its own.
    try {
      val orders = spark.readStream
        .schema(ordersSchema)
        .option("pathGlobFilter", "orders.parquet")
        .parquet(dir)
        .withColumn("price_c", round(col("o_totalprice") * 100).cast("long"))
      val q = graft.ops.Checksum.hashedRows(orders, "o_orderkey",
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "price_c"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"), bit_xor(col("h")).as("xor_digest"))
        .writeStream.outputMode("complete").format("memory").queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
      spark.table(name)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  /** Streaming CDC ingest through `foreachBatch` into a DURABLE parquet
    * change log — the production sink pattern the memory-sink harnesses
    * don't exercise: each micro-batch appends its change rows to the
    * log (append-only, so no read-modify-write race), and the serving
    * view is base ∪ log collapsed to latest-per-key by the same
    * map-side-combining struct-max as the batch `upsert_latest`. At
    * scale the log compacts periodically via [[graft.ops.Layout]]
    * compaction; the view's shuffle carries ~|keys| rows however many
    * change batches accumulate.
    */
  def cdcLogUpsert(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.io.TempDirs.create("cdclog")
    val cents = round(col("o_totalprice") * 100).cast("long")
    val q = spark.readStream
      .schema(ordersSchema)
      .option("pathGlobFilter", "orders.parquet")
      .parquet(dir)
      .filter(pmod(col("o_orderkey"), lit(10)) === 0)
      .select(col("o_orderkey"), lit(1).as("version"), (cents + 100L).as("price_c"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(s"$out/log")
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val base = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"), lit(0).as("version"), cents.as("price_c"))
    // An empty change feed never creates the log directory (foreachBatch
    // only appends when a micro-batch has rows) — fall back to an empty
    // frame with the log schema rather than throwing on the missing path.
    // Existence goes through the Hadoop FileSystem API so the check
    // matches the writer's filesystem (java.io.File is always-false on
    // any non-local store and would silently serve base-only).
    val logPath = new org.apache.hadoop.fs.Path(s"$out/log")
    val logExists = logPath
      .getFileSystem(spark.sessionState.newHadoopConf()).exists(logPath)
    val logDf =
      if (logExists) spark.read.parquet(s"$out/log")
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], base.schema)
    base.unionByName(logDf)
      .groupBy(col("o_orderkey"))
      .agg(max(struct(col("version"), col("price_c"))).as("latest"))
      .select(col("o_orderkey"),
        col("latest.version").as("version"), col("latest.price_c").as("price_c"))
  }

  /** Streaming distribution-drift monitor — the PSI face of the drift
    * family run INCREMENTALLY: the (bin, side) counts accumulate in a
    * streaming aggregation (complete mode; state = one row per
    * occupied bin, bounded by the bin count), binned against a STATIC
    * 1-row baseline config joined into the stream (in production the
    * baseline is a config table; here derived from the same batch
    * table so the result is comparable bit-for-bit to the batch
    * `drift_psi_bins`, whose oracle this query reuses). The share/term
    * arithmetic runs batch-side on the final bin table — the same
    * bounded step [[graft.ext.Drift.psiFromBinned]] the batch query
    * uses.
    */
  private def driftPsiToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val name = s"sdrift_${System.nanoTime()}"
    val stats = graft.ext.Drift.binStats(graft.Tables.events(spark, dir))
      .withColumn("_k", lit(1))
    val q = eventsStream(spark, dir)
      .select(col("ts_us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        lit(1).as("_k"))
      .join(stats, "_k") // stream-static inner equi-join on the dummy key
      .select(expr("(cents - mn) div width").as("bin"),
        when(col("ts_us") <= col("mid"), 1L).otherwise(0L).as("is_a"))
      .groupBy(col("bin"))
      .agg(sum(col("is_a")).as("n_a"), sum(lit(1L) - col("is_a")).as("n_b"))
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    graft.ext.Drift.psiFromBinned(spark.table(name))
  }

  /** Streaming OOV monitor — the tokenizer-coverage readout kept
    * current over an ARRIVING document stream: the static top-30
    * reference vocabulary (computed batch-side, broadcast) probes the
    * stream's token projection, the per-source (n_tokens, n_oov)
    * aggregate runs in complete mode, and the ppm finisher plus the
    * oracle are `lm_oov_coverage`'s, shared bit-for-bit (the drift_psi
    * pattern). The live deployment reads this to catch a source whose
    * vocabulary drifts off the tokenizer — state is one row per
    * source, bounded by the source catalogue.
    */
  private def oovToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val name = s"soov_${System.nanoTime()}"
    val vocab = graft.ext.LmStats.refVocab(
      graft.Tables.documents(spark, dir), 30)
    val stream = spark.readStream.schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val tok = stream.select(col("source"),
      explode(graft.ext.TextAnalysis.tokens(col("text"))).as("w"))
    val q = graft.ext.LmStats.oovCounts(tok, vocab)
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    graft.ext.LmStats.oovFinish(spark.table(name))
  }

  /** Streaming topic-balance monitor: the arriving document stream
    * joins the STATIC k-means pseudo-topic assignment (computed
    * batch-side, id-keyed) and keeps `topic_mix_by_source`'s
    * (source, topic) counts live in complete mode, share finisher
    * batch-side, oracle shared bit-for-bit — the intake face of the
    * data-mixture balance report; state is one row per
    * (source, topic).
    */
  private def topicMixToCompletion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val name = s"stopic_${System.nanoTime()}"
    val asg = graft.ext.KMeans.kmeansAssign2(
        graft.Tables.embeddings(spark, dir), 8)
      .select(col("vec_id"), col("cluster_id"))
    val stream = spark.readStream.schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val q = stream.select(col("doc_id"), col("source"))
      .join(asg, col("doc_id") === col("vec_id")) // stream-static equi-join
      .groupBy(col("source"), col("cluster_id"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .withColumn("src_total",
        sum(col("n")).over(Window.partitionBy(col("source"))))
      .select(col("source"), col("cluster_id"), col("n"),
        expr("n * 1000000 div src_total").as("share_ppm"))
  }

  /** Streaming vocabulary-drift monitor: `vocab_drift_js`'s per-token
    * side counts maintained in complete mode over the document stream
    * (state = one row per vocabulary token), with the top-k + JS-term
    * finisher batch-side — the drift_psi pattern, oracle shared
    * bit-for-bit. The live deployment watches this for a crawl snapshot
    * whose token distribution walks away from yesterday's.
    */
  private def vocabDriftToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val name = s"svdrift_${System.nanoTime()}"
    val stream = spark.readStream.schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val tok = stream.select((col("doc_id") % 2 === 0).as("is_a"),
      explode(graft.ext.TextAnalysis.tokens(col("text"))).as("w"))
    val q = graft.ext.LmStats.vocabDriftCounts(tok)
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    graft.ext.LmStats.vocabDriftFinish(spark.table(name), 64)
  }

  /** Streaming tokenizer-fertility monitor: the per-language
    * words/subwords aggregate of `tokenizer_fertility` maintained in
    * complete mode over the document stream, sharing its oracle —
    * state is one row per language.
    */
  /** Streaming dynamic-batching monitor: the floor-log2 length-bucket
    * aggregate of `batch_length_buckets` maintained in complete mode
    * over the document stream, with the padding-waste/batch-count
    * arithmetic as the batch finisher — sharing the batch oracle
    * bit-for-bit. State is one row per bucket (≤ ~40 buckets by
    * construction), the live answer to "what will tonight's batch plan
    * look like" as the corpus lands.
    */
  private def lengthBucketsToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val name = s"slenbuck_${System.nanoTime()}"
    val stream = spark.readStream.schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val q = graft.ext.Sampling.lengthBucketCounts(stream)
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    graft.ext.Sampling.lengthBucketFinish(spark.table(name))
  }

  /** Streaming PII-prevalence monitor: the per-source class counts of
    * `pii_detect_counts` maintained in complete mode over the document
    * stream, sharing its oracle bit-for-bit — the live compliance gauge
    * as a crawl lands (a source whose pii_chars share spikes gets
    * quarantined before the nightly curation run). The regex projection
    * is stateless per document; state is one row per source.
    */
  private def piiToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val name = s"spii_${System.nanoTime()}"
    val stream = spark.readStream.schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val q = graft.ext.Pii.detectCounts(stream)
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }

  /** Streaming DSIR intake monitor: per-source importance mass of the
    * arriving documents against the STATIC bucket-weight model (trained
    * batch-side on the standing corpus — the stream-static join every
    * production DSIR gate runs), maintained in complete mode and
    * sharing `dsir_source_scores`' oracle bit-for-bit. The projection
    * is stateless per document (in-row bigrams → md5 buckets); state is
    * one row per source.
    */
  private def dsirToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val name = s"sdsir_${System.nanoTime()}"
    val weights = graft.ext.Dsir.bucketWeights(graft.Tables.documents(spark, dir))
    val stream = spark.readStream.schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val q = graft.ext.Dsir.sourceScoresAgainst(stream, weights)
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }

  private def fertilityToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val name = s"sfert_${System.nanoTime()}"
    val stream = spark.readStream.schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val q = graft.ext.LmStats.fertilityCounts(stream)
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    graft.ext.LmStats.fertilityFinish(spark.table(name))
  }

  /** Streaming OHLC bars: `timeseries_ohlc`'s day-keyed aggregate —
    * including the struct-min/max open/close trick — maintained in
    * complete mode over the purchase stream, sharing its oracle
    * bit-for-bit. State is one (min-struct, max-struct, 4 scalars) row
    * per bar: the live candlestick feed without a batch replay.
    */
  private def ohlcToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val name = s"sohlc_${System.nanoTime()}"
    val ticks = eventsStream(spark, dir)
      .where(col("event_type") === "purchase")
      .select(expr("ts_us div 86400000000").as("day"),
        col("ts_us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val q = graft.ext.Timeseries.ohlcBars(ticks)
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }

  /** Streaming freshness monitor: `dq_freshness`'s per-stream
    * (count, newest-day) aggregate maintained in complete mode — a lag
    * alarm is exactly the check that should not wait for a batch
    * audit. The watermark fold runs in the batch finisher (chained
    * aggregations are unsupported in streaming); shares the batch
    * oracle bit-for-bit. State = one row per event type.
    */
  private def freshnessToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val name = s"sfresh_${System.nanoTime()}"
    val q = graft.ext.DataQuality.freshnessCounts(eventsStream(spark, dir))
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    graft.ext.DataQuality.freshnessFinish(spark.table(name))
  }

  /** Streaming surprisal monitor: the per-source bits-per-token score
    * of `quality_surprisal_by_source` maintained in complete mode —
    * the static unigram model (batch-side, broadcast) probes the
    * stream's token projection, and a source drifting toward
    * boilerplate (low bits) or noise (high bits) moves its row live.
    * Shares the batch oracle bit-for-bit; state = one row per source.
    */
  private def surprisalToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val name = s"ssurp_${System.nanoTime()}"
    val model = graft.ext.Quality.unigramModel(
      graft.Tables.documents(spark, dir).select(col("doc_id"),
        explode(graft.ext.TextAnalysis.tokens(col("text"))).as("w")))
    val stream = spark.readStream.schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      .select(col("source"),
        explode(graft.ext.TextAnalysis.tokens(col("text"))).as("w"))
    val q = graft.ext.Quality.surprisalCounts(stream, "source", model)
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    graft.ext.Quality.surprisalFinish(spark.table(name), "source")
  }

  /** Streaming intake-quality monitor: the Gopher rule flags are a
    * stateless projection, so the per-source pass/fail counts of
    * `quality_gopher_by_source` run unchanged as a complete-mode
    * aggregate over the document stream (state = one row per source),
    * sharing its oracle bit-for-bit — the live "which source started
    * shipping garbage" alarm.
    */
  private def gopherToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val name = s"sgoph_${System.nanoTime()}"
    val stream = spark.readStream.schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val q = graft.ext.Quality.gopherCounts(graft.ext.Quality.gopherRules(stream))
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    graft.ext.Quality.gopherFinish(spark.table(name))
  }

  /** Streaming learned-quality monitor: the [[graft.ext.NbFilter]]
    * classifier's per-source keep rates maintained live. The model
    * (weights + consts) trains BATCH-side on the even split; the
    * document stream's held-out half is scored by the STATELESS
    * [[graft.ext.NbFilter.scoreFlags]] path (gopher-flag projection +
    * four alphabet-sized stream-static broadcast equi-joins — zero
    * per-doc state, which is exactly why scoreFlags avoids the per-doc
    * aggregate), and the only streaming state is the #sources-keyed
    * complete-mode rate aggregate. Shares quality_nb_source_rates'
    * oracle bit-for-bit.
    */
  /** Streaming intake face of the backoff-LM coverage monitor: the
    * model (bigram + unigram tables, both persisted batch frames, and
    * the scalar N) is trained batch-side on the standing corpus' even
    * split; arriving documents run the STATELESS
    * [[graft.ext.BackoffLm.costsOf]] path (in-row pair explode + two
    * stream-static equi-joins) into a complete-mode source-keyed
    * aggregate — state is #sources rows of five longs. Shares
    * lm_backoff_coverage's oracle bit-for-bit: the alarm that says a
    * source's OOV rate or mean perplexity is drifting away from the
    * trusted model, without a batch replay.
    */
  private def backoffToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val name = s"sbkf_${System.nanoTime()}"
    val (bgm, uni, n) =
      graft.ext.BackoffLm.train(graft.Tables.documents(spark, dir))
    val stream = spark.readStream.schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val q = graft.ext.BackoffLm
      .costsOf(graft.ext.BackoffLm.pairs(stream), bgm, uni, n)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("kind") === "hit", 1L).otherwise(0L)).as("n_hit"),
        sum(when(col("kind") === "backoff", 1L).otherwise(0L)).as("n_backoff"),
        sum(when(col("kind") === "oov", 1L).otherwise(0L)).as("n_oov"),
        sum(col("mbits")).as("total_mbits"))
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .select(col("source"), col("n_tok"), col("n_hit"), col("n_backoff"),
        col("n_oov"),
        expr("n_oov * 1000000L div n_tok").as("oov_ppm"),
        expr("total_mbits div n_tok").as("mbits_per_tok"))
  }

  private def nbQualityToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val name = s"snbq_${System.nanoTime()}"
    val (weights, consts) =
      graft.ext.NbFilter.trainedWeights(graft.Tables.documents(spark, dir))
    val stream = spark.readStream.schema(documentsSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val scoredStream = graft.ext.NbFilter.scoreFlags(
      graft.ext.Quality.gopherRules(stream).where(col("doc_id") % 2 === 1),
      weights, consts)
    val q = scoredStream
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score_mbits") >= 0, 1L).otherwise(0L)).as("n_pred_pass"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_weak_pass"))
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .select(col("source"), col("n_docs"), col("n_pred_pass"), col("n_weak_pass"),
        expr("n_pred_pass * 1000000L div n_docs").as("pred_pass_ppm"))
  }

  /** Incremental reliability diagram: the streamed complete-mode
    * (bin, n, Σscore, n_pos) aggregate + the batch ≤10-row finisher,
    * BOTH lifted verbatim from ext.Calibration (scoreLabel/binned/
    * reliabilityFinish), sharing calibration_reliability's oracle
    * bit-for-bit — the drift_psi pattern: a scored event stream keeps
    * its calibration readout current without a batch replay.
    */
  private def calibrationToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val name = s"scal_${System.nanoTime()}"
    val fileSchema = spark.read
      .option("pathGlobFilter", "lineitem.parquet").parquet(dir).schema
    val stream = spark.readStream
      .schema(fileSchema)
      .option("pathGlobFilter", "lineitem.parquet")
      .parquet(dir)
    val q = graft.ext.Calibration.binned(graft.ext.Calibration.scoreLabel(stream))
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    graft.ext.Calibration.reliabilityFinish(spark.table(name))
  }

  /** Incremental one-way ANOVA: the per-group (count, sum, sum-sq)
    * moments run as a complete-mode streaming aggregation — the moment
    * stage is associative, so every emission is exact for the data so
    * far — and the k-row staged-F finisher runs on the final table.
    * Shares `anova_f_oneway`'s oracle bit-for-bit (the calibration /
    * drift_psi pattern).
    */
  private def anovaToCompletion(spark: SparkSession, dir: String): DataFrame = {
    val name = s"sanova_${System.nanoTime()}"
    val fileSchema = spark.read
      .option("pathGlobFilter", "events.parquet").parquet(dir).schema
    val stream = spark.readStream
      .schema(fileSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val q = graft.ext.Stats.anovaGroupStats(stream, col("event_type"),
        round(col("value") * 100).cast("long"))
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    graft.ext.Stats.anovaFinish(spark.table(name))
  }

  val queries: Map[String, Q] = Map(
    "streaming_window_agg" -> ((s, dir) => runToCompletion(s, dir)),

    // incremental group moments + the k-row staged-F finisher, sharing
    // anova_f_oneway's oracle
    "streaming_anova_f" -> ((s, dir) => anovaToCompletion(s, dir)),

    // incremental reliability diagram sharing calibration_reliability's
    // oracle (the drift_psi share-the-batch-oracle pattern)
    "streaming_calibration" -> ((s, dir) => calibrationToCompletion(s, dir)),

    // incremental PSI drift: streamed (bin, side) counts + the batch
    // share/term step, sharing drift_psi_bins' oracle
    "streaming_drift_psi" -> ((s, dir) => driftPsiToCompletion(s, dir)),

    // tokenizer-coverage and fertility monitors over the document
    // stream, sharing the batch lm_oov_coverage / tokenizer_fertility
    // oracles bit-for-bit
    "streaming_oov_monitor" -> ((s, dir) => oovToCompletion(s, dir)),
    "streaming_vocab_drift" -> ((s, dir) => vocabDriftToCompletion(s, dir)),
    "streaming_topic_mix" -> ((s, dir) => topicMixToCompletion(s, dir)),
    "streaming_fertility" -> ((s, dir) => fertilityToCompletion(s, dir)),
    "streaming_pii_monitor" -> ((s, dir) => piiToCompletion(s, dir)),
    "streaming_dsir_monitor" -> ((s, dir) => dsirToCompletion(s, dir)),
    "streaming_length_buckets" -> ((s, dir) => lengthBucketsToCompletion(s, dir)),
    "streaming_quality_monitor" -> ((s, dir) => gopherToCompletion(s, dir)),
    "streaming_nb_quality" -> ((s, dir) => nbQualityToCompletion(s, dir)),
    "streaming_backoff_monitor" -> ((s, dir) => backoffToCompletion(s, dir)),
    "streaming_ohlc" -> ((s, dir) => ohlcToCompletion(s, dir)),
    "streaming_freshness_monitor" -> ((s, dir) => freshnessToCompletion(s, dir)),
    "streaming_surprisal_monitor" -> ((s, dir) => surprisalToCompletion(s, dir)),

    // incremental windowed counts + batch top-k finisher (see
    // topkWindowToCompletion for why the rank must not be in-stream)
    "streaming_topk_window" -> ((s, dir) => topkWindowToCompletion(s, dir)),

    // sketch inside a streaming aggregation (exact distinct is
    // unsupported there); streamed estimate pinned equal to the batch
    // sketch, bounded against the oracle's exact counts
    "streaming_hll_window" -> ((s, dir) => hllWindowToCompletion(s, dir)),

    // streaming face of `upsert_latest`, sharing its oracle: the change
    // feed lands in a parquet log via foreachBatch, the view collapses
    // base ∪ log to latest-per-key
    "streaming_cdc_upsert" -> ((s, dir) => cdcLogUpsert(s, dir)),

    "streaming_sliding_window" -> ((s, dir) => slidingCountsToCompletion(s, dir)),

    // Stream-STATIC anti-join: the streaming-ingest face of incremental
    // dedup — arriving documents (the md5-bucket "new batch") are
    // dropped when their content hash already exists in the standing
    // corpus. The static side is re-read per micro-batch by contract
    // (Spark plans it as a fresh scan), is stateless (no watermark
    // needed — a static row set can never retract), and at scale the
    // right static side is a compact content-hash table, not the
    // corpus itself. Fully deterministic → exact batch oracle.
    "streaming_static_antijoin" -> ((s, dir) => {
      val corpusHashes = graft.Tables.documents(s, dir)
        .filter(!(graft.ext.Sampling.hashBucket(col("doc_id")) < 6554))
        .select(md5(to_binary(col("text"), lit("utf-8"))).as("content_hash"))
        .distinct()
      val name = s"santi_${System.nanoTime()}"
      val q = s.readStream
        .schema(documentsSchema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(dir)
        .filter(graft.ext.Sampling.hashBucket(col("doc_id")) < 6554)
        .withColumn("content_hash", md5(to_binary(col("text"), lit("utf-8"))))
        .join(corpusHashes, Seq("content_hash"), "left_anti")
        .select(col("doc_id"), col("content_hash"))
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
      s.table(name)
    }),

    // Stateful sessionization, run to completion with a sentinel-driven
    // final watermark flush — emits closed sessions AND open tails, so
    // the result equals batch `sessionize` and shares its exact oracle.
    "streaming_sessionize" -> ((s, dir) => sessionizeToCompletion(s, dir)),

    // Stateful ordered-funnel (the streaming form of `funnel_steps`,
    // sharing its exact oracle): per-user candidate buffers in
    // flatMapGroupsWithState, finalized once the watermark passes the
    // sentinel flush — one emitted row per funnel entrant.
    "streaming_funnel" -> ((s, dir) => funnelToCompletion(s, dir)),

    // Stateful streaming CUSUM (the streaming form of
    // `changepoint_cusum`, sharing its exact oracle): per-type event
    // buffers — inherent to mean-centered + out-of-order semantics, see
    // cusumStream — flushed by the watermark sentinel into the full
    // two-sided curve.
    "streaming_cusum" -> ((s, dir) => cusumToCompletion(s, dir)),
    // keys-scaled face: one bounded buffer per USER (state grows with
    // population, not per-key depth) — shares changepoint_cusum_by_user's
    // exact oracle
    "streaming_cusum_by_user" -> ((s, dir) => cusumByUserToCompletion(s, dir)),

    // Incremental replica digest (shares table_checksum's exact
    // oracle): XOR's merge-invariance makes the micro-batch fold equal
    // the batch digest algebraically, not approximately.
    "streaming_checksum" -> ((s, dir) => checksumStream(s, dir)),

    // Stream-stream INNER join with a time-interval condition: each
    // purchase joins the same user's clicks from the preceding hour.
    // Watermarks on both sides + the interval bound let the engine
    // evict join state (clicks older than the watermark minus the
    // interval can never match again) — unbounded streams, bounded
    // state. Inner-join emission is complete over the fixture, so the
    // batch join oracle is exact.
    "streaming_join" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // stream-stream join state is per-shuffle-partition per side —
      // size the state width to the (small) keyed stream, not the
      // session default meant for batch scans. The override is scoped:
      // EVERYTHING from plan construction to stop() sits inside the
      // try, and the restore runs even if start()/stop() throws.
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val name = s"sjoin_${System.nanoTime()}"
      try {
        def src(tpe: String, alias: String) = eventsStream(s, dir)
          .filter(col("event_type") === tpe)
          .select(col("user_id").as(s"${alias}_user"),
            col("event_id").as(s"${alias}_event"),
            timestamp_micros(col("ts_us")).as(s"${alias}_ts"))
          .withWatermark(s"${alias}_ts", "1 hour")
        val q = src("purchase", "p").join(src("click", "c"),
            col("p_user") === col("c_user") &&
              col("p_ts") >= col("c_ts") &&
              col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
          .select(col("p_user").as("user_id"), col("p_event").as("purchase_id"),
            col("c_event").as("click_id"))
          .writeStream.outputMode("append").format("memory").queryName(name).start()
        try q.processAllAvailable()
        finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      s.table(name)
    }),

    // Stream-stream LEFT OUTER interval join — the semantics inner join
    // cannot give: a purchase with NO click inside its lookback hour
    // must still emit (click_id −1). An outer result is only provably
    // final once the GLOBAL watermark (min across both inputs) passes
    // the row's match window, so the run-to-completion harness unions a
    // far-future sentinel into EACH side (one sentinel advances only
    // its own input's watermark) and triggers twice: the watermark
    // moves after the first batch, the second batch drains the
    // now-final outer rows. Unmatched ids coalesce to −1 on both
    // engines so the null never reaches the hash compare.
    "streaming_join_outer" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val name = s"sojoin_${System.nanoTime()}"
      try {
        def mem() =
          org.apache.spark.sql.execution.streaming.runtime.MemoryStream[JoinEv]
        val (pSent, cSent) = (mem(), mem())
        def src(tpe: String, alias: String, sent: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[JoinEv]) =
          eventsStream(s, dir)
            .filter(col("event_type") === tpe)
            .select(col("user_id"), col("event_id"), col("ts_us"))
            .as[JoinEv].union(sent.toDS())
            .select(col("user_id").as(s"${alias}_user"),
              col("event_id").as(s"${alias}_event"),
              timestamp_micros(col("ts_us")).as(s"${alias}_ts"))
            .withWatermark(s"${alias}_ts", "1 hour")
        val q = src("purchase", "p", pSent).join(src("click", "c", cSent),
            col("p_user") === col("c_user") &&
              col("p_ts") >= col("c_ts") &&
              col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"),
            "left_outer")
          .select(col("p_user").as("user_id"), col("p_event").as("purchase_id"),
            coalesce(col("c_event"), lit(-1L)).as("click_id"))
          .writeStream.outputMode("append").format("memory").queryName(name).start()
        try {
          pSent.addData(JoinEv(-1L, -1L, FlushTsUs))
          cSent.addData(JoinEv(-1L, -1L, FlushTsUs))
          q.processAllAvailable()
          pSent.addData(JoinEv(-1L, -1L, FlushTsUs + 3600000001L))
          cSent.addData(JoinEv(-1L, -1L, FlushTsUs + 3600000001L))
          q.processAllAvailable()
        } finally q.stop()
        s.table(name).filter(col("user_id") >= 0)
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    }),

    // Streaming exact dedup: dropDuplicatesWithinWatermark keys the
    // state by (user_id, minute) and prunes it by the watermark — the
    // streaming analogue of the batch hash-dedup, in bounded memory.
    // The static fixture arrives as one micro-batch, so the emitted set
    // equals the batch DISTINCT and the oracle is exact.
    "streaming_dedup" -> ((s, dir) => {
      val name = s"dedup_${System.nanoTime()}"
      val q = eventsStream(s, dir)
        .withColumn("ts_event", timestamp_micros(col("ts_us")))
        .withColumn("minute", expr("ts_us div 60000000"))
        .withWatermark("ts_event", "1 hour")
        .dropDuplicatesWithinWatermark("user_id", "minute")
        .select(col("user_id"), col("minute"))
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable()
      finally q.stop()
      s.table(name)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "streaming_window_agg" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
        |  event_type, count(*) AS n
        |FROM events
        |GROUP BY 1, 2""".stripMargin,
    "streaming_topk_window" ->
      """WITH c AS (
        |  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
        |    event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY window_start_us
        |      ORDER BY n DESC, event_type) AS rk
        |  FROM c)
        |SELECT window_start_us, CAST(rk AS BIGINT) AS rk, event_type, n
        |FROM r WHERE rk <= 3""".stripMargin,
    // exact per-window counts from the oracle; both sketch booleans
    // pinned TRUE (stream≡batch registers is exact; the fleet-sized ±5
    // absolute slack for small windows is derived in the Scaladoc)
    "streaming_hll_window" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
        |  event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS exact_users,
        |  CAST(TRUE AS BOOLEAN) AS stream_eq_batch_sketch,
        |  CAST(TRUE AS BOOLEAN) AS within_bound
        |FROM events
        |GROUP BY 1, 2""".stripMargin,
    // identical to the batch upsert_latest oracle — the log-backed view
    // must collapse to the same latest-per-key table
    "streaming_cdc_upsert" ->
      """WITH all_rows AS (
        |  SELECT o_orderkey, 0 AS version,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 1 AS version,
        |    CAST(round(o_totalprice * 100) AS BIGINT) + 100 AS price_c
        |  FROM orders WHERE o_orderkey % 10 = 0)
        |SELECT o_orderkey, version, price_c FROM all_rows
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY version DESC) = 1""".stripMargin,
    // batch LEFT JOIN with the identical interval predicate; unmatched
    // clicks coalesce to -1 so no NULL reaches the hash compare
    "streaming_join_outer" ->
      """SELECT p.user_id, p.event_id AS purchase_id,
        |  COALESCE(c.event_id, -1) AS click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        |  AND epoch_us(p.ts) >= epoch_us(c.ts)
        |  AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000""".stripMargin,
    // identical to the batch event_sliding_window oracle — the flushed
    // stream must reproduce the batch result exactly
    "streaming_sliding_window" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us, value FROM events)
        |SELECT event_type,
        |  (ts_us // 1800000000 - k) * 1800000000 AS window_start_us,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM e, UNNEST(generate_series(0, 1)) AS u(k)
        |WHERE ts_us >= (ts_us // 1800000000 - k) * 1800000000
        |  AND ts_us < (ts_us // 1800000000 - k) * 1800000000 + 3600000000
        |GROUP BY 1, 2""".stripMargin,
    "streaming_dedup" ->
      """SELECT DISTINCT user_id, epoch_us(ts) // 60000000 AS minute
        |FROM events""".stripMargin,
    "streaming_static_antijoin" ->
      """SELECT doc_id, md5(text) AS content_hash
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) < 6554
        |  AND md5(text) NOT IN (
        |    SELECT md5(text) FROM documents
        |    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) >= 6554)""".stripMargin,
    // the streaming funnel emits exactly the batch funnel's rows, so it
    // shares funnel_steps' first-match-join oracle verbatim
    "streaming_funnel" -> graft.ext.Sessionize.oracleSql("funnel_steps"),
    "streaming_cusum" -> graft.ext.Timeseries.oracleSql("changepoint_cusum"),
    "streaming_cusum_by_user" ->
      graft.ext.Timeseries.oracleSql("changepoint_cusum_by_user"),
    "streaming_drift_psi" -> graft.ext.Drift.oracleSql("drift_psi_bins"),
    "streaming_oov_monitor" -> graft.ext.LmStats.oracleSql("lm_oov_coverage"),
    "streaming_vocab_drift" -> graft.ext.LmStats.oracleSql("vocab_drift_js"),
    "streaming_topic_mix" -> graft.ext.KMeans.oracleSql("topic_mix_by_source"),
    "streaming_fertility" -> graft.ext.LmStats.oracleSql("tokenizer_fertility"),
    "streaming_pii_monitor" -> graft.ext.Pii.oracleSql("pii_detect_counts"),
    "streaming_dsir_monitor" -> graft.ext.Dsir.oracleSql("dsir_source_scores"),
    "streaming_length_buckets" -> graft.ext.Sampling.oracleSql("batch_length_buckets"),
    "streaming_quality_monitor" ->
      graft.ext.Quality.oracleSql("quality_gopher_by_source"),
    "streaming_nb_quality" ->
      graft.ext.NbFilter.oracleSql("quality_nb_source_rates"),
    "streaming_backoff_monitor" ->
      graft.ext.BackoffLm.oracleSql("lm_backoff_coverage"),
    "streaming_ohlc" -> graft.ext.Timeseries.oracleSql("timeseries_ohlc"),
    "streaming_freshness_monitor" ->
      graft.ext.DataQuality.oracleSql("dq_freshness"),
    "streaming_surprisal_monitor" ->
      graft.ext.Quality.oracleSql("quality_surprisal_by_source"),
    "streaming_anova_f" -> graft.ext.Stats.oracleSql("anova_f_oneway"),
    "streaming_calibration" ->
      graft.ext.Calibration.oracleSql("calibration_reliability"),
    "streaming_checksum" -> graft.ops.Checksum.oracleSql("table_checksum"),

    // identical to the batch `sessionize` oracle — the flushed stream
    // must reproduce it bit-for-bit
    "streaming_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts_us, value,
        |    CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000
        |           OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (
        |  SELECT user_id, ts_us, value,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM s GROUP BY user_id, session_id""".stripMargin,
    "streaming_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND epoch_us(p.ts) >= epoch_us(c.ts)
        | AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000""".stripMargin
  )
}
