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
}
