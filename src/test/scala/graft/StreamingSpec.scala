package graft

import graft.ext.Sessionize
import graft.streaming.StreamingOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streaming hourly counts equal the batch aggregation") {
    val streamed = StreamingOps.runToCompletion(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val batch = Tables.events(spark, sf)
      .groupBy((col("ts_us") - pmod(col("ts_us"), lit(3600000000L))).as("window_start_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("streaming PSI drift equals the batch drift_psi_bins bit for bit") {
    val streamed = SparkEntry.queries("streaming_drift_psi")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val batch = graft.ext.Drift.psiBins(Tables.events(spark, sf))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
  }

  test("streaming OOV and fertility monitors equal their batch faces bit for bit") {
    for ((sq, bq) <- Seq("streaming_oov_monitor" -> "lm_oov_coverage",
      "streaming_fertility" -> "tokenizer_fertility")) {
      val streamed = SparkEntry.queries(sq)(spark, sf)
        .collect().map(_.toString).sorted.toSeq
      val batch = SparkEntry.queries(bq)(spark, sf)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch, sq)
    }
  }

  test("streaming PII monitor equals the batch pii_detect_counts bit for bit") {
    val streamed = SparkEntry.queries("streaming_pii_monitor")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val batch = SparkEntry.queries("pii_detect_counts")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
  }

  test("streaming NB quality monitor equals the batch source rates bit for bit") {
    val streamed = SparkEntry.queries("streaming_nb_quality")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val batch = SparkEntry.queries("quality_nb_source_rates")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
  }

  test("streaming backoff-LM monitor equals the batch coverage face bit for bit") {
    val streamed = SparkEntry.queries("streaming_backoff_monitor")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val batch = SparkEntry.queries("lm_backoff_coverage")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
  }

  test("streaming surprisal monitor equals the batch by-source face bit for bit") {
    val streamed = SparkEntry.queries("streaming_surprisal_monitor")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val batch = SparkEntry.queries("quality_surprisal_by_source")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
  }

  test("streaming freshness monitor equals the batch audit bit for bit") {
    val streamed = SparkEntry.queries("streaming_freshness_monitor")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val batch = SparkEntry.queries("dq_freshness")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
  }

  test("streaming OHLC bars equal the batch bars bit for bit") {
    val streamed = SparkEntry.queries("streaming_ohlc")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val batch = SparkEntry.queries("timeseries_ohlc")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
  }

  test("streaming quality monitor equals the batch by-source rollup bit for bit") {
    val streamed = SparkEntry.queries("streaming_quality_monitor")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val batch = SparkEntry.queries("quality_gopher_by_source")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
  }

  test("streaming calibration equals the batch reliability diagram bit for bit") {
    val streamed = SparkEntry.queries("streaming_calibration")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val batch = SparkEntry.queries("calibration_reliability")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
    assert(streamed.length == 10)
  }

  test("CDC upsert with an EMPTY change feed serves the base unchanged (no missing-log throw)") {
    // craft a fixture whose orders have NO keys divisible by 10 — the
    // change-feed filter matches zero rows, foreachBatch never creates
    // the log directory, and the serving view must fall back to base
    val dir = graft.io.TempDirs.create("cdc_empty")
    Tables.orders(spark, sf)
      .filter(pmod(col("o_orderkey"), lit(10)) =!= 0)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val served = StreamingOps.cdcLogUpsert(spark, dir)
    val base = spark.read.parquet(s"$dir/orders.parquet")
    assert(served.count() == base.count())
    assert(served.filter(col("version") =!= 0).count() == 0,
      "no change rows may appear for an empty feed")
  }

  test("stream-static anti-join equals the batch anti-join on content hash") {
    val streamed = SparkEntry.queries("streaming_static_antijoin")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val docs = Tables.documents(spark, sf)
    val isBatch = graft.ext.Sampling.hashBucket(col("doc_id")) < 6554
    val corpusHashes = docs.filter(!isBatch)
      .select(md5(to_binary(col("text"), lit("utf-8"))).as("content_hash")).distinct()
    val batch = docs.filter(isBatch)
      .withColumn("content_hash", md5(to_binary(col("text"), lit("utf-8"))))
      .join(corpusHashes, Seq("content_hash"), "left_anti")
      .select(col("doc_id"), col("content_hash"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch)
  }

  test("stream-static anti-join DROPS already-seen content (planted fixture)") {
    import spark.implicits._
    // pick real ids on each side of the md5 bucket split
    val sides = (1L to 60L).toDF("doc_id")
      .withColumn("b", graft.ext.Sampling.hashBucket(col("doc_id")) < 6554)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val batchIds = sides.filter(_._2).keys.toSeq.sorted
    val corpusIds = sides.filterNot(_._2).keys.toSeq.sorted
    assert(batchIds.size >= 2, s"need 2 batch-side ids in 1..60, got $batchIds")
    val dir = graft.io.TempDirs.create("santi_fixture")
    val rows = Seq(
      (batchIds(0), "duplicate content already in the corpus"),
      (batchIds(1), "fresh content never seen before"),
      (corpusIds(0), "duplicate content already in the corpus"),
      (corpusIds(1), "corpus only content")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    // the driver testdata layout is one FILE per table
    val tmp = java.nio.file.Paths.get(dir, "_stage")
    rows.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = java.nio.file.Files.list(tmp)
    val part =
      try listing.filter(_.toString.endsWith(".parquet")).findFirst().get()
      finally listing.close()
    java.nio.file.Files.move(part, java.nio.file.Paths.get(dir, "documents.parquet"))
    val got = SparkEntry.queries("streaming_static_antijoin")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(batchIds(1)), s"only the fresh batch doc survives: $got")
  }

  test("flushed streaming sessions EQUAL batch sessions, ordinals and cents included") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    val cols = Seq("user_id", "session_id", "session_start_us",
      "session_end_us", "n_events", "value_cents").map(col)
    val streamed = StreamingOps.sessionizeToCompletion(spark, sf)
      .select(cols: _*).collect().map(key).toSet
    val batch = Sessionize.sessions(Tables.events(spark, sf))
      .select(cols: _*).collect().map(key).toSet
    assert(streamed.nonEmpty, "no sessions emitted by the stream")
    assert(streamed == batch, s"stream-with-flush must equal batch sessionize: " +
      s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }

  test("flushed streaming funnel EQUALS the batch funnel row-for-row") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), Option(r.get(2)), Option(r.get(3)), r.getInt(4))
    val cols = Seq("user_id", "t1_us", "t2_us", "t3_us", "steps").map(col)
    val streamed = StreamingOps.funnelToCompletion(spark, sf)
      .select(cols: _*).collect().map(key).toSet
    val batch = Sessionize.funnelSteps(Tables.events(spark, sf),
        Seq("view", "click", "purchase"), 86400000000L)
      .select(cols: _*).collect().map(key).toSet
    assert(streamed.nonEmpty, "no funnel rows emitted by the stream")
    assert(streamed == batch, s"stream-with-flush must equal batch funnel: " +
      s"missing=${(batch -- streamed).take(3)} extra=${(streamed -- batch).take(3)}")
  }

  test("streaming funnel: a LATE step-1 event re-qualifies a buffered later-step candidate") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingOps.FunnelEv]
    val name = s"funnel_late_${System.nanoTime()}"
    val q = StreamingOps.funnelStream(src.toDS(), Seq("view", "click", "purchase"), 100L)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      // batch 1: the click arrives FIRST — no view yet, so nothing chains
      src.addData(StreamingOps.FunnelEv(1L, "click", 50L))
      q.processAllAvailable()
      // batch 2: the view arrives LATE (event-time 10 < the click's 50,
      // admissible under the 1h watermark delay) — the buffered click
      // must now qualify (10 < 50 <= 110)
      src.addData(StreamingOps.FunnelEv(1L, "view", 10L))
      q.processAllAvailable()
      // flush sentinels fire the timeout emission
      src.addData(StreamingOps.FunnelEv(-1L, "view", StreamingOps.FlushTsUs))
      q.processAllAvailable()
      src.addData(StreamingOps.FunnelEv(-1L, "view", StreamingOps.FlushTsUs + 7200000000L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)), r.getInt(4)))
    assert(rows.toSeq == Seq((1L, 10L, Some(50L), 2)),
      s"late view must re-qualify the buffered click: ${rows.toSeq}")
  }
}
