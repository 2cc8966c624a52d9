package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end face of the runtime filter: a broadcast join between the
  * touch source and a selective dimension on `source_node_id` should
  * carry a runtime group filter into the BatchScan (Spark's dynamic
  * pruning for V2 sources), and results must equal the unpruned join.
  * The direct Scan-API contract is pinned in RuntimeFilterSpec; this
  * spec pins that the PINNED Spark build actually wires it up.
  */
class DppProbeSpec extends AnyFunSuite {

  lazy val spark = graft.SparkTestSession.spark

  test("join against a selective dim: results exact; plan inspected for runtime filters") {
    import spark.implicits._
    val path = graft.pipelines.TouchToParquet.fixturePath(2)
    val touches = spark.read.format("touchbin").load(path)
      .select(col("source_node_id"), col("target_node_id"))
    val dim = Seq(touches.select(min(col("source_node_id")))
      .head().getInt(0)).toDF("gid")
    val joined = touches.join(broadcast(dim),
      touches("source_node_id") === dim("gid"))
    val n = joined.count()
    val expected = touches
      .where(col("source_node_id") === dim.head().getInt(0)).count()
    assert(n == expected && n > 0, s"join rows $n vs filter rows $expected")
    val plan = joined.queryExecution.executedPlan.toString
    // the pinned Spark build (4.1.2) injects the runtime filter into
    // the V2 BatchScan for this shape — assert it so a regression in
    // the filterAttributes/filter contract fails loudly
    assert(plan.contains("RuntimeFilters: ["),
      s"expected a runtime filter on the touch BatchScan:\n$plan")
  }
}
