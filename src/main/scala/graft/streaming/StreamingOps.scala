package graft.streaming

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  /** events schema with `ts` as raw nanosecond longs (cannot rely on
    * runtime inference in a stream; TIMESTAMP(NANOS) needs nanosAsLong).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming hourly counts per event type. `withWatermark` bounds state;
    * emitted results are compared against the batch oracle in
    * complete-output mode.
    */
  def hourlyCountsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet") // file source needs a dir
      .parquet(dir)
      .withColumn("ts_event", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts_event", "1 hour")
      .groupBy(window(col("ts_event"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"))
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

  val queries: Map[String, Q] = Map(
    "streaming_window_agg" -> ((s, dir) => runToCompletion(s, dir))
  )

  val oracleSql: Map[String, String] = Map(
    "streaming_window_agg" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
        |  event_type, count(*) AS n
        |FROM events
        |GROUP BY 1, 2""".stripMargin
  )
}
