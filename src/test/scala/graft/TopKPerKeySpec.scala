package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerKeySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("custom operator matches the window formulation exactly") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val custom = TopKPerKey.topKPerKey(li, Seq("l_suppkey"),
        Seq(("l_quantity", true), ("l_orderkey", false), ("l_linenumber", false)), k = 7)
      .collect().map(_.toSeq.mkString("|")).sorted
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
    val windowed = li.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 7)
      .collect().map(_.toSeq.mkString("|")).sorted
    assert(custom.length == windowed.length)
    assert(custom.toSeq == windowed.toSeq)
  }

  test("plan shape: partial heap before the exchange, final after") {
    val li = Tables.lineitem(spark, sf).select(col("l_suppkey"), col("l_orderkey"))
    val df = TopKPerKey.topKPerKey(li, Seq("l_suppkey"), Seq(("l_orderkey", false)), 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopK"), plan)
    assert(plan.contains("FinalTopK"), plan)
    val partialIdx = plan.indexOf("PartialTopK")
    val exchangeIdx = plan.indexOf("Exchange")
    val finalIdx = plan.indexOf("FinalTopK")
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx,
      s"expected Final above Exchange above Partial:\n$plan")
  }

  test("optimizer rule rewrites the window idiom into the heap plan; rows unchanged") {
    import graft.plans.{TopKRewrite, TopKStrategy}
    val li = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
    def windowForm = li.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
    // reference WITHOUT the rule: vanilla Window plan
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == TopKRewrite)
    val refPlan = windowForm.queryExecution.executedPlan.toString
    assert(!refPlan.contains("FinalTopK"), refPlan)
    val expected = windowForm.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    // with the rule: the SAME code plans as the partial/final heap pair
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ TopKRewrite
    try {
      val rewritten = windowForm
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("PartialTopK") && plan.contains("FinalTopK"), plan)
      assert(!plan.contains("Window"), s"Window must be gone:\n$plan")
      assert(rewritten.collect().map(_.toSeq.mkString("|")).sorted.toSeq == expected)
      // non-literal bounds, multi-expression windows, rank-only plans
      // must NOT rewrite: rank without filter keeps its Window
      val rankOnly = li.withColumn("rank", row_number().over(w))
      assert(rankOnly.queryExecution.executedPlan.toString.contains("Window"))
    } finally {
      // leave the shared session as this test found it
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TopKRewrite)
    }
  }

  test("k larger than group size returns whole groups, ranked") {
    import spark.implicits._
    val df = Seq((1, 10), (1, 20), (2, 30)).toDF("k", "v")
    val res = TopKPerKey.topKPerKey(df, Seq("k"), Seq(("v", true)), 100)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sorted
    assert(res.toSeq == Seq((1, 10, 2), (1, 20, 1), (2, 30, 1)))
  }
}
