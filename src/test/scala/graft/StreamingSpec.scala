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
