package graft

import org.apache.spark.sql.SparkSession

/** Dumps the AQE-final executed plan of registered queries — the source
  * of the PLANS.md captures. Usage:
  *   runMain graft.PlanDump <sfDir> <query1> [query2 ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <query...>")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional session-conf overrides for a capture, e.g.
    // SPARK_GRAFT_PLAN_CONF="spark.sql.autoBroadcastJoinThreshold=-1"
    // (comma-separated k=v pairs) to show a plan outside AQE's
    // small-scale choices
    sys.env.get("SPARK_GRAFT_PLAN_CONF").foreach(_.split(",").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => spark.conf.set(k, v)
        case _ => System.err.println(s"PlanDump: ignoring malformed conf entry '$kv'")
      }
    })
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, args(0))
      df.collect() // finalize AQE
      println(s"== PLAN $name ==")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString(
          sys.env.getOrElse("SPARK_GRAFT_PLAN_MODE", "simple"))))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
