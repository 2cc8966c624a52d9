package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions: the optimizations the engine is
  * designed around must actually appear in the executed plan — pushdown,
  * column pruning, broadcast joins, whole-stage codegen, range-partitioned
  * exchanges. Guards against silent plan regressions.
  */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("interval-overlap rewrite replaces the nested-loop join with the binned equi-join") {
    import spark.implicits._
    def naive(): org.apache.spark.sql.DataFrame = {
      val a = (1L to 50L).map(i => (i, i * 10, i * 10 + 35)).toDF("a_id", "a_s", "a_e")
      val b = (1L to 50L).map(i => (i, i * 12, i * 12 + 20)).toDF("b_id", "b_s", "b_e")
      a.join(b, $"a_s" < $"b_e" && $"b_s" < $"a_e")
    }
    // control: without the conf the theta join stays a nested-loop plan
    // (unset defensively — suite order may have left the auto query's
    // session-scoped opt-in behind)
    spark.conf.unset(graft.plans.IntervalJoinRewrite.BinWidthConf)
    val control = naive()
    control.collect()
    assert(planOf(control).contains("BroadcastNestedLoopJoin"), planOf(control))
    if (!spark.experimental.extraOptimizations.contains(graft.plans.IntervalJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.IntervalJoinRewrite
    spark.conf.set(graft.plans.IntervalJoinRewrite.BinWidthConf, "25")
    try {
      val auto = naive()
      val rows = auto.collect()
      val plan = planOf(auto)
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
      assert(plan.contains("Generate"), plan) // the bin explosion is in the plan
      // observationally identical to the nested-loop result
      val expected = control.collect().map(_.toSeq).toSet
      assert(rows.map(_.toSeq).toSet == expected)
      assert(rows.length == expected.size) // report-once: no duplicate pairs
    } finally spark.conf.unset(graft.plans.IntervalJoinRewrite.BinWidthConf)
  }

  test("equality filters push down to the parquet scan") {
    val plan = planOf(Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") === 42).select(col("l_linenumber")))
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]"), plan)
  }

  test("column pruning reaches the scan ReadSchema") {
    val plan = planOf(SparkEntry.queries("scan_parquet_dir")(spark, sf))
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"), plan)
  }

  test("dimension joins broadcast (no shuffle of the fact side)") {
    val plan = planOf(SparkEntry.queries("join_broadcast")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q1 aggregate is partial+final inside whole-stage codegen") {
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    df.collect() // finalize THIS plan's AQE (count() would plan separately)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(plan.contains("*(1)"), plan) // whole-stage codegen span
    assert("partial_sum".r.findAllIn(plan).nonEmpty, plan) // map-side combine
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan) // partial + final
  }

  test("range shuffle uses RangePartitioning (the MPI_Alltoallv analogue)") {
    val plan = planOf(SparkEntry.queries("shuffle_by_key_range")(spark, sf))
    assert(plan.contains("rangepartitioning"), plan)
  }

  test("semi/anti joins do not materialize payload columns") {
    val plan = planOf(SparkEntry.queries("join_semi")(spark, sf))
    assert(plan.contains("LeftSemi"), plan)
  }

  test("top-k compiles to TakeOrdered, not a global sort") {
    val plan = planOf(SparkEntry.queries("topk_orders")(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("embedding cosine dedup has no nested-loop/cartesian product") {
    val df = SparkEntry.queries("dedup_embedding_cosine")(spark, sf)
    df.collect() // finalize AQE
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // triangle ownership means one dot per pair BY CONSTRUCTION: the
    // plan must contain no aggregate at all (a pair-dedup would show as
    // HashAggregate(keys=[vec_a, vec_b])) and join on the cell id
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"blocked cosine dedup must not need a pair-dedup shuffle:\n$plan")
    spark.catalog.clearCache()
  }

  test("minhash LSH pair dedup shuffles 16-byte id pairs, not signatures") {
    val df = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the (doc_a, doc_b) dropDuplicates must be a pure-key aggregate: a
    // payload-carrying dedup would compile to first(sig_a)/first(sig_b)
    // functions inside the HashAggregate, shipping both 256-byte
    // signatures through the dedup exchange once per shared band
    assert(!plan.contains("first(sig"),
      s"pair dedup must not carry signatures through its exchange:\n$plan")
    spark.catalog.clearCache()
  }

  test("decontamination broadcasts the eval-gram side; training side never sort-merges") {
    val df = SparkEntry.queries("decontaminate_ngrams")(spark, sf)
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    spark.catalog.clearCache()
  }

  test("connected-components ROUNDS are equi-joins/aggregates — no product, no window") {
    import spark.implicits._
    // the loop checkpoints every round, so the converged query's plan
    // starts at Scan ExistingRDD — the round shape must be asserted on
    // an un-checkpointed contraction directly
    val edges = (1L to 50L).map(i => (i, i + 1)).toDF("u", "v")
    val round = graft.ext.DedupCluster.smallStar(graft.ext.DedupCluster.largeStar(edges))
    round.collect()
    val plan = round.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("HashAggregate"), plan) // min-per-node rounds are aggregates
  }

  test("connected-components label assembly has no product and no window") {
    import spark.implicits._
    // asserted on the un-checkpointed assembly: the public API
    // checkpoints its result, which would reduce the plan to an RDD scan
    val edges = (1L to 50L).map(i => (i, i + 1)).toDF("u", "v")
    val df = graft.ext.DedupCluster.assembleLabels(edges)
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("tfidf top-k runs through the partial/final TopKPerKey operator") {
    val df = SparkEntry.queries("tfidf_top_terms")(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("PartialTopK") && plan.contains("FinalTopK"), plan)
  }

  test("binned range join is an equi-join, not a nested-loop product") {
    val df = SparkEntry.queries("join_range_binned")(spark, sf)
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("ngram-jaccard joins: BHJ at small scale, SMJ once broadcast is off (the 10x probe's flip)") {
    // the round-7 scale probe observed Catalyst flip the pair-aggregate
    // size joins from broadcast to sort-merge at 10x data — the plan
    // you'd want at 100 TB, chosen by stats. Pin BOTH regimes so the
    // scale-correct behavior can't silently regress: small inputs under
    // the default 10 MB threshold broadcast; with the threshold forced
    // off (standing in for "stats say too big") the same query
    // sort-merges, while the EXPLICIT broadcast hint on the hot-shingle
    // anti-join guard survives either way.
    def planFor(): String = {
      val df = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      df.collect() // finalize AQE — runtime sizes decide the join strategy
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      spark.catalog.clearCache()
      p
    }
    val small = planFor()
    assert(small.contains("BroadcastHashJoin"), small)
    assert(!small.contains("SortMergeJoin"), small)
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = planFor()
      assert(big.contains("SortMergeJoin"),
        s"size joins must sort-merge when broadcast is off:\n$big")
      assert(big.contains("BroadcastHashJoin"),
        s"the explicit broadcast(hot) hint must survive the threshold:\n$big")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("sign-LSH bucketed ANN joins: BHJ at small scale, SMJ once broadcast is off (the 10x probe's flip)") {
    // the round-9 probe observed ann_lsh_bucketed's candidate/fetch
    // joins flip BHJ→SMJ at 10x data (same_plan=false, board 1.11→1.69s)
    // — the identical stats-driven pattern already pinned for
    // dedup_ngram_jaccard: at 100 TB the corpus side is NOT
    // broadcastable, so sort-merge on the bucket/id keys is the plan
    // you'd want, chosen by stats. Pin BOTH regimes so neither can
    // silently regress: small inputs broadcast; with the threshold
    // forced off (standing in for "stats say too big") the same query
    // sort-merges.
    def planFor(): String = {
      val df = SparkEntry.queries("ann_lsh_bucketed")(spark, sf)
      df.collect() // finalize AQE — runtime sizes decide the join strategy
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      spark.catalog.clearCache()
      p
    }
    val small = planFor()
    assert(small.contains("BroadcastHashJoin"), small)
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = planFor()
      assert(big.contains("SortMergeJoin"),
        s"candidate/fetch joins must sort-merge when broadcast is off:\n$big")
      assert(!big.contains("CartesianProduct") &&
        !big.contains("BroadcastNestedLoopJoin"),
        s"the bucket self-join must stay an equi-join in either regime:\n$big")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("item-similarity joins: BHJ at small scale, SMJ once broadcast is off (the 10x probe's flip)") {
    // the round-10 probe observed recsys_item_similarity's basket
    // self-join and per-item size joins flip BHJ→SMJ at 10x data
    // (same_plan=false, ratio 2.36) — the third instance of the
    // stats-driven pattern already pinned for dedup_ngram_jaccard and
    // ann_lsh_bucketed: at 100 TB neither the distinct basket table nor
    // the per-item counts broadcast, so sort-merge on the basket/item
    // keys is the plan you'd want, chosen by stats. Pin BOTH regimes.
    def planFor(): String = {
      val df = SparkEntry.queries("recsys_item_similarity")(spark, sf)
      df.collect() // finalize AQE — runtime sizes decide the join strategy
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      spark.catalog.clearCache()
      p
    }
    val small = planFor()
    assert(small.contains("BroadcastHashJoin"), small)
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = planFor()
      assert(big.contains("SortMergeJoin"),
        s"basket/size joins must sort-merge when broadcast is off:\n$big")
      assert(!big.contains("CartesianProduct") &&
        !big.contains("BroadcastNestedLoopJoin"),
        s"the basket self-join must stay an equi-join in either regime:\n$big")
      // the top-k must still ride the partial/final heap, not a window
      assert(big.contains("PartialTopK") && big.contains("FinalTopK"), big)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("session-wave shapes: exchange-free gopher scan, hinted vocab broadcast, keyed ILD joins") {
    def finalPlan(name: String): String = {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      spark.catalog.clearCache()
      p
    }
    // quality_gopher_rules is ONE stateless projection: any Exchange
    // in its plan means a regression added a shuffle to a per-row map
    val gopher = finalPlan("quality_gopher_rules")
    assert(!gopher.contains("Exchange"), gopher)
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the OOV vocab probe is an EXPLICIT broadcast() of the 30-row
      // vocabulary — it must survive with stats-driven broadcasting off
      // (at 100 TB the token stream side never broadcasts; the hint
      // pins the only correct build side)
      val oov = finalPlan("lm_oov_coverage")
      assert(oov.contains("BroadcastHashJoin"), oov)
      assert(!oov.contains("CartesianProduct") &&
        !oov.contains("BroadcastNestedLoopJoin"), oov)
      // recsys_ild composes the item-similarity chain: with broadcast
      // off every join must be a sort-merge EQUI-join (the pinned
      // BHJ→SMJ flip pattern the 10x probe observed at ratio 2.54)
      val ild = finalPlan("recsys_ild")
      assert(ild.contains("SortMergeJoin"), ild)
      assert(!ild.contains("CartesianProduct") &&
        !ild.contains("BroadcastNestedLoopJoin"), ild)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("explicit bloomSemiJoin: probe filter in the fact scan stage, result equals plain semi join") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val urgent = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
    val j = ops.JoinOps.bloomSemiJoin(li, "l_orderkey", urgent, "o_orderkey")
    val plan = planOf(j)
    assert(plan.contains("bloom_might_contain"),
      s"the bloom probe must survive into the physical plan:\n$plan")
    // the probe is a Filter below the join (printed deeper in the tree),
    // i.e. it runs scan-side, before any exchange toward the join
    assert(plan.indexOf("bloom_might_contain") > plan.indexOf("Join"),
      s"bloom probe must sit under the join, not above it:\n$plan")
    val got = j.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    val want = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi")
      .collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    assert(got == want, "bloom prefilter must not change the semi-join result")
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf).filter(col("o_totalprice") > 400000)
      val j = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(col("l_orderkey"), col("l_quantity"))
      j.collect()
      val plan = j.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      assert(plan.contains("might_contain"),
        s"runtime bloom filter should prune the fact scan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("groupedSelect winsorize: no data-sized range repartition, bounds broadcast back") {
    val df = graft.ops.Reshape.queries("winsorize_by_group")(spark, sf)
    df.collect()
    val plan = planOf(df)
    // the histogram route must not range-repartition the data (that was
    // the 3.3x-at-10x formulation); the clip pass joins the tiny bounds
    // table by broadcast
    assert(!plan.toLowerCase.contains("rangepartitioning"),
      s"winsorize must not sort the data by range:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"clip bounds should broadcast:\n$plan")
    spark.catalog.clearCache()
  }

  test("last-touch attribution: one user-keyed window, no join anywhere") {
    val df = graft.ext.Attribution.queries("attribution_last_touch")(spark, sf)
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("Window"), s"expected a window plan:\n$plan")
    assert(!plan.contains("Join"), s"last-touch must be join-free:\n$plan")
  }

  test("multiclass_prf scans the fact table ONCE (margins reuse the confusion exchange)") {
    val df = graft.ext.ClassifierEval.queries("multiclass_prf")(spark, sf)
    df.collect() // finalize AQE
    val plan = planOf(df)
    // the FINAL plan section only — the printed tree appends the AQE
    // initial plan, which legitimately shows the pre-reuse scans
    val finalPlan = plan.split("== Initial Plan ==").head
    val scans = "FileScan parquet".r.findAllIn(finalPlan).length
    assert(scans == 1,
      s"expected exactly one fact scan (got $scans) — a where(t=p) diagonal " +
        s"pushes below the aggregate and defeats ReuseExchange:\n$finalPlan")
    assert(finalPlan.contains("ReusedExchange"),
      s"the pred-margin branch must reuse the (t,p) exchange:\n$finalPlan")
  }

  test("anova_f_oneway and matthews_corr scan the fact table ONCE (pure aggregate chains)") {
    for (name <- Seq("anova_f_oneway", "matthews_corr")) {
      val df =
        if (name == "anova_f_oneway") graft.ext.Stats.queries(name)(spark, sf)
        else graft.ext.ClassifierEval.queries(name)(spark, sf)
      df.collect()
      val finalPlan = planOf(df).split("== Initial Plan ==").head
      val scans = "FileScan parquet".r.findAllIn(finalPlan).length
      assert(scans == 1, s"$name: expected one fact scan, got $scans:\n$finalPlan")
      assert(!finalPlan.contains("SortMergeJoin") && !finalPlan.contains("NestedLoop"),
        s"$name must be a join-free aggregate chain:\n$finalPlan")
    }
  }

  test("kruskal_wallis_h broadcasts the value-alphabet rank table to the per-group join") {
    val df = graft.ext.RankStats.queries("kruskal_wallis_h")(spark, sf)
    df.collect()
    val finalPlan = planOf(df).split("== Initial Plan ==").head
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"the midrank table (bounded by the cents alphabet) must broadcast:\n$finalPlan")
    assert(!finalPlan.contains("SortMergeJoin"),
      s"no data-sized shuffle join belongs in the KW plan:\n$finalPlan")
  }

  test("theilsen_trend: the pairwise join and median window run over the day-bounded aggregate") {
    val df = graft.ext.Timeseries.queries("theilsen_trend")(spark, sf)
    df.collect()
    val finalPlan = planOf(df).split("== Initial Plan ==").head
    // both join inputs are the day-keyed aggregate — the fact table is
    // scanned for the daily rollup, never fed raw into the self-join
    assert("FileScan parquet".r.findAllIn(finalPlan).length <= 2,
      s"theilsen: the self-join must consume the daily aggregate, not raw scans:\n$finalPlan")
    assert(!finalPlan.contains("SortMergeJoin"),
      s"the calendar-bounded slope join must not shuffle-sort:\n$finalPlan")
    assert(finalPlan.contains("Window"),
      s"the discrete-median rank runs as a window over the bounded pair frame:\n$finalPlan")
  }

  test("HITS half-steps read persisted raw scores (no exponential re-derivation)") {
    import spark.implicits._
    val edges = (1L to 40L).flatMap(s => (1L to 5L).map(p => (s, 1000L + (s + p) % 20)))
      .toDF("src", "dst")
    val df = graft.ext.Hits.hitsInt(edges, iterations = 2)
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("InMemoryTableScan"),
      s"HITS must read cached half-step tables:\n$plan")
    spark.catalog.clearCache()
  }

  test("graph edge-support/conductance joins: BHJ at small scale, SMJ once broadcast is off (the 10x probe's flip)") {
    // the round-12 probe observed both queries' node-keyed joins (label
    // tables, degree tables, per-community aggregates — all graph-sized)
    // flip BHJ→SMJ at 10x data: the identical stats-driven pattern
    // pinned for dedup_ngram_jaccard/ann_lsh_bucketed. At 100 TB a
    // node-sized side is NOT broadcastable, so sort-merge on node/edge
    // keys is the plan you'd want, chosen by stats. Pin BOTH regimes.
    // (The queries' BroadcastNestedLoopJoins are 1-row scalar frames —
    // modularity totals, support floors — legitimate in either regime,
    // so no BNLJ-absence assert here; the structural sweep bounds them.)
    def planFor(name: String): String = {
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect() // finalize AQE — runtime sizes decide the join strategy
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
      spark.catalog.clearCache()
      p
    }
    Seq("graph_edge_support", "graph_community_conductance").foreach { q =>
      val small = planFor(q)
      assert(small.contains("BroadcastHashJoin"), s"$q small:\n$small")
    }
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Seq("graph_edge_support", "graph_community_conductance").foreach { q =>
        val big = planFor(q)
        assert(big.contains("SortMergeJoin"),
          s"$q node-keyed joins must sort-merge when broadcast is off:\n$big")
        assert(!big.contains("CartesianProduct"),
          s"$q must stay cartesian-free in either regime:\n$big")
      }
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
