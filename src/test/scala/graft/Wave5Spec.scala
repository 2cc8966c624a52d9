package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Session wave 5: Gopher rule filter, OHLC bars, token-budget epoch
  * planning — hand-computed fixtures plus a window-formulation
  * cross-check for the struct-trick open/close.
  */
class Wave5Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark

  test("gopherRules: each rule flips on its own boundary") {
    import spark.implicits._
    val longDoc = ("the of " + "word " * 60).trim // 62 words, 2 stopwords
    val shortDoc = "the of tiny doc" // fails ok_len
    val longWords = ("the of " + ("supercalifragilistic " * 60)).trim // mean > 10
    val numeric = ("the of " + "123 " * 60).trim // alpha share 2/62 < 80%
    val d = Seq((0L, longDoc), (1L, shortDoc), (2L, longWords), (3L, numeric))
      .map { case (i, t) => (i, t, s"src${i % 2}") }
      .toDF("doc_id", "text", "source")
    val r = graft.ext.Quality.gopherRules(d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getAs[Boolean]("pass"))
    assert(!r(1L).getAs[Boolean]("ok_len") && r(1L).getAs[Boolean]("ok_stop"))
    assert(!r(2L).getAs[Boolean]("ok_word_len") && r(2L).getAs[Boolean]("ok_len"))
    assert(!r(3L).getAs[Boolean]("ok_alpha") && !r(3L).getAs[Boolean]("pass"))
    // mean word length fixed-point: doc 0 = (3+2+4*60)*100 div 62 = 395
    assert(r(0L).getAs[Long]("mean_word_len_x100") == 395L)
  }

  test("ohlcBars: struct-trick open/close equals the window formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ticks = Seq.tabulate(500) { i =>
      (i % 5L, rnd.nextInt(1000000).toLong, i.toLong, rnd.nextInt(10000).toLong)
    }.toDF("day", "ts_us", "event_id", "cents")
    val got = graft.ext.Timeseries.ohlcBars(ticks).collect()
      .map(r => r.getLong(0) -> r).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("day").orderBy(col("ts_us"), col("event_id"))
    val ref = ticks
      .withColumn("rn", row_number().over(w))
      .withColumn("rnd", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("day")
          .orderBy(col("ts_us").desc, col("event_id").desc)))
      .groupBy("day")
      .agg(max(when(col("rn") === 1, col("cents"))).as("open"),
        max(when(col("rnd") === 1, col("cents"))).as("close"),
        max("cents").as("high"), min("cents").as("low"),
        count(lit(1)).as("n"), sum("cents").as("vol"))
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((day, g) <- got) {
      val e = ref(day)
      assert(g.getAs[Long]("open_cents") == e.getAs[Long]("open"), s"open $day")
      assert(g.getAs[Long]("close_cents") == e.getAs[Long]("close"), s"close $day")
      assert(g.getAs[Long]("high_cents") == e.getAs[Long]("high"))
      assert(g.getAs[Long]("low_cents") == e.getAs[Long]("low"))
      assert(g.getAs[Long]("volume_cents") == e.getAs[Long]("vol"))
    }
  }

  test("pcaPowerIteration: recovers a planted dominant axis, partition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // variance planted on dim 2; dims 0,1,3 carry ~100x less spread
    val vecs = Seq.tabulate(60) { i =>
      (i.toLong, Array(
        (rnd.nextFloat() - 0.5f) * 0.1f,
        (rnd.nextFloat() - 0.5f) * 0.1f,
        (rnd.nextFloat() - 0.5f) * 4.0f,
        (rnd.nextFloat() - 0.5f) * 0.1f))
    }
    def run(parts: Int) = graft.ext.Sq8.pcaPowerIteration(
        vecs.toDF("vec_id", "embedding").repartition(parts))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val v = run(1)
    assert(v.keySet == Set(0L, 1L, 2L, 3L))
    // dominant component on the planted axis, L1 mass ~1e6 (truncation
    // loses at most d per round)
    assert(math.abs(v(2L)) > 900000L, v.toString)
    Seq(0L, 1L, 3L).foreach(d => assert(math.abs(v(d)) < math.abs(v(2L))))
    val l1 = v.values.map(math.abs).sum
    assert(l1 <= 1000000L && l1 > 999900L, l1.toString)
    assert(run(7) == v) // integer arithmetic: partition-invariant
  }

  test("edgeSupport: triangle edges score 1+, bridges score 0") {
    import spark.implicits._
    // two triangles joined by a bridge: the 6 triangle edges have
    // support 1, the bridge has support 0 (the 3-truss reject)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("u", "v")
    val r = graft.ext.GraphOps.edgeSupport(edges).collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getLong(2), x.getBoolean(3)))).toMap
    assert(r.size == 7)
    assert(r((3L, 4L)) == ((0L, false)), r.toString)
    (r - ((3L, 4L))).values.foreach { case (s, t) =>
      assert(s == 1L && t)
    }
    // K4: every edge sits in 2 triangles
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val rk = graft.ext.GraphOps.edgeSupport(k4).collect()
    assert(rk.length == 6 && rk.forall(_.getLong(2) == 2L))
  }

  test("conductance: cut identity and hand-computed two-clique bridge") {
    import spark.implicits._
    // two triangles joined by one bridge edge: each community (the
    // triangle) has vol = 2*3+1 = 7, e_in = 3, cut = 1; m = 7 edges;
    // min(vol, 2m - vol) = 7 -> conductance = 1e6 div 7 = 142857
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("u", "v")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("node_id", "community")
    val r = graft.ext.GraphOps.communityConductance(edges, labels)
      .collect().map(x => x.getLong(0) -> x).toMap
    for ((_, row) <- r) {
      assert(row.getAs[Long]("deg_sum") ==
        2 * row.getAs[Long]("e_in") + row.getAs[Long]("cut"))
      assert(row.getAs[Long]("cut") == 1L)
      assert(row.getAs[Long]("conductance_ppm") == 142857L, row.toString)
    }
  }

  test("shard manifest: checksums partition the corpus and detect membership change") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("shard_manifest_checksum")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // every shard's checksum is positive and shard-distinct with
    // overwhelming probability on 48-bit sums
    assert(rows.map(_.getAs[Long]("id_checksum")).distinct.length == rows.length)
    spark.catalog.clearCache()
  }

  test("quality_unigram_surprisal: rarer tokens carry more bits, exact flog2") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("quality_unigram_surprisal")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bits = r.getAs[Long]("surprisal_bits")
      val n = r.getAs[Long]("n_tokens")
      assert(bits >= 0L && n > 0L)
      assert(r.getAs[Long]("bits_per_token_milli") == bits * 1000L / n)
    }
  }

  test("dedup_cluster_sizes: the spectrum partitions the corpus exactly") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("dedup_cluster_sizes")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    rows.foreach(r => assert(
      r.getAs[Long]("n_docs") ==
        r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters")))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs, rows.mkString(","))
    spark.catalog.clearCache()
  }

  test("dq_freshness: watermark type has zero lag, lags nonnegative") {
    val rows = SparkEntry.queries("dq_freshness")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("lag_days") >= 0L))
    assert(rows.exists(r => r.getAs[Long]("lag_days") == 0L &&
      !r.getAs[Boolean]("stale")))
  }

  test("mixture_epochs_budget: equal shares, epochs against exact token counts") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("mixture_epochs_budget")(spark, sf).collect()
    val k = rows.length
    assert(k > 0)
    rows.foreach { r =>
      assert(r.getAs[Long]("target_tokens") == 10000000L / k)
      val expected = (10000000L / k) * 1000L /
        math.max(r.getAs[Long]("n_tokens"), 1L)
      assert(r.getAs[Long]("epochs_milli") == expected)
      assert(r.getAs[Boolean]("oversampled") == (expected > 1000L))
    }
  }
}
