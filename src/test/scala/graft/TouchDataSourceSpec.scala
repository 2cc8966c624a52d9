package graft

import graft.io.TouchBinary
import graft.pipelines.TouchToParquet
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 touch connector: values must match the RDD-based
  * decoder bit-for-bit on every fixture version, column pruning must
  * reach the scan, and record-aligned splits must not change results.
  */
class TouchDataSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.mkString("|")).sorted.toSeq

  test("v1/v2/v3 fixtures decode identically to the RDD path") {
    for (v <- 1 to 3) {
      val path = TouchToParquet.fixturePath(v)
      val v2 = spark.read.format("touchbin").load(path)
      val rdd = TouchBinary.readProjected(spark, path)
      assert(v2.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        rdd.schema.fields.map(f => (f.name, f.dataType)).toSeq, s"v$v schema")
      assert(rows(v2) == rows(rdd), s"v$v values")
    }
  }

  test("column pruning reaches the scan (2 of 22 fields decoded)") {
    val df = spark.read.format("touchbin").load(TouchToParquet.fixturePath(2))
      .select("source_node_id", "distance_soma")
    df.collect()
    val leaves = df.queryExecution.executedPlan.collectLeaves()
    assert(leaves.nonEmpty)
    assert(leaves.head.schema.fieldNames.toSeq ==
      Seq("source_node_id", "distance_soma"),
      s"scan must emit only the pruned columns: ${leaves.head.schema}")
  }

  test("record-aligned splits: many partitions, identical results") {
    val path = TouchToParquet.fixturePath(2)
    val df = spark.read.format("touchbin")
      .option("maxBytesPerPartition", (80 * 100).toString) // 100 records/split
      .load(path)
    assert(df.rdd.getNumPartitions > 5, s"${df.rdd.getNumPartitions} partitions")
    assert(rows(df) == rows(TouchBinary.readProjected(spark, path)))
  }
}
