package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions entry point: every custom expression and
  * the HLL aggregate must be callable from PURE SQL after registration —
  * the surface a SQL-only user of the engine sees.
  */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkTestSession.spark
    GraftExtensions.register(s)
    s
  }

  test("word_shingles is SQL-callable and matches the Column API") {
    val r = spark.sql(
      "SELECT word_shingles('the quick brown fox jumps', 3) AS sh").collect()(0)
    assert(r.getSeq[String](0) ==
      Seq("the quick brown", "quick brown fox", "brown fox jumps"))
  }

  test("quantized_dot and sign_lsh_buckets are SQL-callable") {
    val r = spark.sql(
      """SELECT quantized_dot(array(1000L, -2000L), array(3000L, 500L)) AS d,
        |       size(sign_lsh_buckets(array(1000L, -2000L), 4, 8)) AS nb""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) == 1000L * 3000 + -2000L * 500)
    assert(r.getInt(1) == 8)
  }

  test("simhash64 in SQL equals the Column API") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq("alpha beta gamma delta").toDF("t")
    val viaCol = df.select(graft.ext.Dedup.simhash(col("t"))).collect()(0).getLong(0)
    val viaSql = spark.sql("SELECT simhash64('alpha beta gamma delta')").collect()(0).getLong(0)
    assert(viaCol == viaSql)
  }

  test("hll_distinct aggregates in SQL with grouping") {
    import spark.implicits._
    (0 until 1000).map(i => (i % 2, i.toLong)).toDF("g", "k")
      .createOrReplaceTempView("hll_in")
    val rows = spark.sql(
      "SELECT g, hll_distinct(k, 12) AS n FROM hll_in GROUP BY g ORDER BY g")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    rows.foreach { case (_, n) =>
      assert(math.abs(n - 500.0) / 500.0 < 0.05, s"estimate $n vs 500")
    }
  }

  test("misra_gries aggregates in SQL; exact below capacity") {
    import spark.implicits._
    (Seq.fill(30)("x") ++ Seq.fill(12)("y") ++ Seq.fill(5)("z")).toDF("t")
      .createOrReplaceTempView("mg_in")
    val rows = spark.sql(
      "SELECT explode(misra_gries(t, 8)) AS e FROM mg_in")
      .selectExpr("e.token", "e.est_count")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("x" -> 30L, "y" -> 12L, "z" -> 5L))
  }

  test("count_min aggregates in SQL; row sums equal the stream length") {
    import spark.implicits._
    (Seq.fill(30)("x") ++ Seq.fill(12)("y") ++ Seq.fill(5)("z")).toDF("t")
      .createOrReplaceTempView("cms_in")
    val cells = spark.sql("SELECT count_min(t, 4, 32) AS c FROM cms_in")
      .collect().head.getSeq[Long](0)
    assert(cells.length == 4 * 32)
    for (i <- 0 until 4) {
      assert(cells.slice(i * 32, (i + 1) * 32).sum == 47L, s"row $i")
    }
    // point estimate via the shared bucket function: min over rows >= exact
    val estX = (0 until 4).map(i =>
      cells(i * 32 + graft.functions.CountMinAgg.bucket(i, "x", 32))).min
    assert(estX >= 30L)
  }

  test("bloom_filter / bloom_might_contain round-trip in SQL") {
    import spark.implicits._
    (1L to 100L).toDF("k").createOrReplaceTempView("bloom_in")
    val rows = spark.sql(
      """WITH bf AS (SELECT bloom_filter(k, 4096, 5) AS f FROM bloom_in),
        |p AS (SELECT n, bloom_might_contain(n, f, 5) AS hit
        |      FROM bf, (SELECT explode(sequence(1L, 100L)) AS n))
        |SELECT count_if(hit) AS n_hits, count(*) AS n FROM p""".stripMargin)
      .collect()(0)
    assert(rows.getLong(0) == rows.getLong(1),
      "no false negatives over the inserted range")
  }

  test("topk_pairs aggregates in SQL; exact, ties broken, invariant to partitioning") {
    import spark.implicits._
    // ord ties at 30 → payload ASC decides; k=3 cuts at the tie
    val rows = Seq((10L, 1L), (30L, 9L), (30L, 2L), (20L, 5L), (5L, 7L))
    for (parts <- Seq(1, 3, 5)) {
      rows.toDF("o", "p").repartition(parts).createOrReplaceTempView("tk_in")
      val got = spark.sql(
        """SELECT e.rank, e.ord, e.payload
          |FROM (SELECT topk_pairs(o, p, 3) AS top FROM tk_in)
          |LATERAL VIEW explode(top) AS e""".stripMargin)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == Seq((1, 30L, 2L), (2, 30L, 9L), (3, 20L, 5L)),
        s"parts=$parts: $got")
    }
  }

  test("the extensions class wires the same registrations") {
    // builder-time path: apply to a fresh SparkSessionExtensions and
    // confirm every function injects without error
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext) // throws on malformed registration
  }
}
