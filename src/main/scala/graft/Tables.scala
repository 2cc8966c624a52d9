package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet; Spark's vectorized reader gives
  * row-group-granular partitions and footer-stat pruning for free
  * (reference: multi-file scan at src/circuit/parquet_reader.cpp:60-130
  * re-expressed as `spark.read.parquet`).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark's TimestampType
    * (micros) cannot represent; read it as raw nanosecond longs and expose
    * both the long (`ts_ns`, exact — what oracles compare on via DuckDB
    * `epoch_ns`) and a micros-truncated TimestampType `ts` for
    * window/streaming operators.
    *
    * Deliberately session-global: `nanosAsLong` must still be set when the
    * lazy DataFrame EXECUTES, so it cannot be set-and-restored around the
    * `read` call. All nanos-parquet in this engine flows through this
    * loader, so the long-typed reading is uniform rather than
    * order-dependent.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }
}
