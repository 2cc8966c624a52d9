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

  test("stateful streaming sessions are a subset of batch sessions (open tails unemitted)") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = spark.readStream
      .schema(StreamingOps.eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
      .select(col("user_id"), expr("ts div 1000").as("ts_us"), col("value"))
      .as[StreamingOps.Ev]
    val name = s"sessions_${System.nanoTime()}"
    val q = StreamingOps.sessionizeStream(src, Sessionize.SessionGapUs)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = Sessionize.sessions(Tables.events(spark, sf))
      .select(col("user_id"), col("session_start_us"), col("session_end_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed.nonEmpty, "no sessions closed by the stream")
    val missing = streamed -- batch
    assert(missing.isEmpty, s"streamed sessions not in batch: ${missing.take(3)}")
  }
}
