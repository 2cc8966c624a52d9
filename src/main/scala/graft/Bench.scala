package graft

import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Per-round benchmark: times every registered query at the given scale
  * factor and prints ONE JSON line. A full warmup pass runs first so the
  * timed passes measure steady-state execution (codegen compiled, JIT
  * warm, file listings cached) rather than JVM startup.
  *
  * **Board mode is contention-robust by construction** (round-7 audit:
  * the end-of-round board swung 1.84× on UNCHANGED plans because the
  * driver benches on a shared machine): every query is timed at least
  * twice in-session, queries whose best time still exceeds
  * [[ExtraRepSec]] get a third rep, and the recorded number is the
  * per-query MINIMUM — machine contention only ever ADDS time, so min
  * is the estimator a contended run perturbs least. Rep passes run in
  * the same interleaved hash order as the warmup so same-family
  * queries never hammer one input back-to-back.
  *
  * `SPARK_GRAFT_ISOLATED=1` switches to the falsifiable mode the
  * round-6 audit asked for: each query gets a FRESH SparkContext (so no
  * cross-query cache/GC/codegen state leaks into its number) with one
  * untimed warmup plus `SPARK_GRAFT_REPS` (default 3) timed runs INSIDE
  * that context — per-rep contexts were tried in round 7 and made every
  * timed rep a cold JVM, conflating engine time with codegen/JIT
  * warmup. Reported per query: the median of the timed reps. Default
  * query set = top 10 by cost from the newest board record PLUS any
  * query whose newest board time exceeds 2.5× its previous-board time
  * (round 7's biggest movers escaped adjudication because they weren't
  * top-10). Override with SPARK_GRAFT_ONLY.
  */
object Bench {

  /** Queries whose best-of-2 exceeds this get a third board rep. */
  private val ExtraRepSec = 1.0

  /** A newest-board/previous-board ratio above this marks a mover
    * (round-8 audit: 2.5 let five sub-second regressions escape
    * adjudication; 1.5 over the min-of-reps board is above rep noise).
    */
  private val MoverRatio = 1.5

  /** Movers also need this many absolute seconds of delta — a 0.1 s
    * query drifting to 0.16 s clears the ratio on scheduler noise
    * alone and would waste an isolated slot.
    */
  private val MoverMinDeltaSec = 0.25

  /** Isolated-mode target-set ceiling: a globally-contended previous
    * board can mark half the suite as movers; cap the run at the most
    * expensive offenders and LOG what was dropped (never truncate
    * silently).
    */
  private val MaxIsolated = 32

  private def newSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Every action stringifies its plan for the SQL-UI event
      // (SQLExecution.withNewExecutionId → explainString), and plans
      // whose lineage nests persisted frames (the BPE chain, the
      // two-phase position scans) print their CACHED CHILDREN
      // recursively — measured 3-5 s of pure driver tree-walk per
      // action on pack_fill_audit with execution itself at 1 s
      // (round-11 adjudication of the round-10 "+2.1 s unexplained
      // delta"). Cap the description; the computation is untouched.
      .config("spark.sql.maxPlanStringLength",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PLAN_STR", "1024"))
      // Deliberate join-strategy baseline (optimization guide §3.1/§9):
      // let the planner pick shuffled-hash join when its size conditions
      // hold and let AQE rewrite sort-merge → shuffled-hash when every
      // post-shuffle partition is under the local-map threshold —
      // measured −9% on a 25-query mixed subset at sf0.1 with zero
      // regressions (r14 optimization round). Scale note: SHJ's risk is
      // a build-side partition that outgrows memory; the 64m AQE
      // threshold bounds exactly that per-partition build size, and both
      // knobs are env-overridable for cluster tuning.
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_LOCALMAP", "64m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  /** Newest driver-written round number; this run's records belong to
    * the round AFTER it (the driver benches before writing its file).
    */
  private def currentRound(repo: java.nio.file.Path): Int = {
    val benchRe = "BENCH_r(\\d+)\\.json".r
    val listing = java.nio.file.Files.list(repo)
    val last =
      try listing.iterator().asScala
        .flatMap(p => benchRe.findFirstMatchIn(p.getFileName.toString))
        .map(_.group(1).toInt).foldLeft(0)(math.max)
      finally listing.close()
    last + 1
  }

  private def repoDir: Option[java.nio.file.Path] = {
    val repo = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo"))
    if (java.nio.file.Files.isDirectory(repo) &&
        java.nio.file.Files.exists(repo.resolve("build.sbt"))) Some(repo)
    else None
  }

  /** Full board records (bench_full_r*.json), newest round first. */
  private[graft] def boardRecords(repo: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val re = "bench_full_r(\\d+)\\.json".r
    val listing = java.nio.file.Files.list(repo)
    try listing.iterator().asScala
      .flatMap(p => re.findFirstMatchIn(p.getFileName.toString)
        .map(m => (m.group(1).toInt, p)))
      .toSeq.sortBy(-_._1).map(_._2)
    finally listing.close()
  }

  /** Per-query seconds from one board record. The record is
    * machine-written by [[main]] and FLAT (`"name":sec`) — a nested
    * queries object (a format change) fails LOUDLY here instead of
    * silently yielding an empty or mis-keyed set.
    */
  private[graft] def boardQueries(p: java.nio.file.Path): Map[String, Double] = {
    val json = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    val marker = "\"queries\":{"
    val start = json.indexOf(marker)
    require(start >= 0, s"$p: no \"queries\" object — board format changed?")
    val body = json.substring(start + marker.length)
    val end = body.indexOf('}')
    require(end >= 0 && !body.substring(0, end).contains("{"),
      s"$p: \"queries\" is not a flat name:seconds map — update boardQueries")
    body.substring(0, end).split(",").filter(_.nonEmpty).flatMap { kv =>
      kv.split(":") match {
        case Array(k, v) =>
          scala.util.Try(v.toDouble).toOption.map(k.replaceAll("\"", "") -> _)
        case _ => None
      }
    }.toMap
  }

  /** Isolated-mode default target set: top-`n` by cost in the newest
    * board record, plus any query whose newest board time exceeds
    * [[MoverRatio]]× its previous-board time by at least
    * [[MoverMinDeltaSec]] — so a board anomaly on a mid-cost query is
    * auto-adjudicated instead of waiting for a human to notice it (the
    * round-7 sequencing gap). Movers are CAP-EXEMPT: the round-8 audit
    * found five sub-second regressions that the cost-ordered cap
    * excluded, which is exactly backwards — a regressed query is the
    * one needing adjudication; the cap trims the top-cost tier first.
    */
  private[graft] def isolatedTargets(repo: java.nio.file.Path, n: Int): Seq[String] = {
    val boards = boardRecords(repo)
    boards.headOption.toSeq.flatMap { newestP =>
      val newest = boardQueries(newestP)
      val top = newest.toSeq.sortBy { case (k, v) => (-v, k) }.take(n).map(_._1)
      val movers = boards.drop(1).headOption.map(boardQueries).map { prev =>
        newest.collect {
          case (q, t) if prev.get(q).exists(p0 =>
            p0 > 0 && t > MoverRatio * p0 && t - p0 > MoverMinDeltaSec) => q
        }.toSeq.sorted
      }.getOrElse(Seq.empty)
      if (movers.nonEmpty)
        System.err.println(s"[isolated] board movers (> ${MoverRatio}x prev, > ${MoverMinDeltaSec}s delta): ${movers.mkString(",")}")
      val all = (top ++ movers).distinct
      if (all.size <= MaxIsolated) all
      else {
        // movers first (they are why isolated mode exists), then the
        // most expensive by the newest board — those dominate the total
        // the round is graded on. Never truncate silently.
        val moverSet = movers.toSet
        val kept = all.sortBy(q =>
          (if (moverSet(q)) 0 else 1, -newest.getOrElse(q, 0.0), q)).take(MaxIsolated)
        System.err.println(s"[isolated] capping ${all.size} targets to $MaxIsolated; " +
          s"dropped: ${all.diff(kept).mkString(",")}")
        kept
      }
    }
  }

  private def runIsolated(sfDir: String, cpus: String): Unit = {
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    require(reps >= 1, s"SPARK_GRAFT_REPS must be >= 1, got $reps")
    val names = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSeq)
      .orElse(repoDir.map(isolatedTargets(_, 10)))
      .getOrElse(Seq.empty)
      .filter(SparkEntry.queries.contains)
    require(names.nonEmpty, "isolated mode: no queries (no board record and no SPARK_GRAFT_ONLY)")
    val results = names.map { name =>
      // ONE fresh SparkContext per QUERY: cross-query isolation without
      // the per-rep cold-JVM bias (fresh context per REP made every
      // timed run pay codegen + JIT, ~2s floor on mid-cost queries).
      // Warmup runs inside the same context, untimed; clearCache between
      // runs — several operators persist() intermediates.
      val spark = newSession(cpus)
      val runs =
        try (0 to reps).map { _ =>
          val t0 = System.nanoTime()
          ForceEval.run(SparkEntry.queries(name)(spark, sfDir))
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          dt
        }.drop(1).sorted
        finally spark.stop()
      val median = runs(runs.size / 2)
      System.err.println(f"[isolated] $name%-35s median ${median}%7.2f s  runs ${runs.map(r => f"$r%.2f").mkString(",")}")
      name -> (median, runs)
    }
    val qs = results.map { case (k, (m, runs)) =>
      "\"" + k + "\":{\"median\":" + m + ",\"runs\":[" + runs.mkString(",") + "]}"
    }.mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    val json = s"""{"metric":"isolated_median_total","value":$total,"unit":"sec","reps":$reps,"queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // same guard as the board record: an explicit SPARK_GRAFT_ONLY run is
    // local iteration and must not overwrite the round's full record
    if (sys.env.get("SPARK_GRAFT_ONLY").isEmpty) {
      repoDir.foreach { repo =>
        java.nio.file.Files.write(
          repo.resolve(f"bench_isolated_r${currentRound(repo)}%02d.json"),
          json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    if (sys.env.get("SPARK_GRAFT_ISOLATED").exists(v => v == "1" || v == "true")) {
      runIsolated(sfDir, cpus)
      return
    }
    val spark = newSession(cpus)

    // optional comma-separated filter for local iteration; the driver
    // leaves it unset (full run)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // deterministic but NON-alphabetical order (hash of the name):
    // alphabetical order runs whole families (dedup_*, streaming_*)
    // back-to-back, compounding contention on the same cached inputs —
    // interleaving spreads it (PLANS.md round-7 note)
    val names = SparkEntry.queries.keys.toSeq
      .sortBy(n => (n.hashCode, n))
      .filter(n => only.forall(_.contains(n)))
    // NaN = the rep FAILED — time-to-exception must never enter the min
    // (a broken query would otherwise report its shortest failed run as
    // a legitimate speedup on the record the round is graded on)
    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { ForceEval.run(SparkEntry.queries(name)(spark, sfDir)); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // several operators persist() intermediates — letting those
      // accumulate would measure cache eviction instead of the operators
      spark.catalog.clearCache()
      if (ok) dt else Double.NaN
    }
    // warmup pass (untimed)
    names.foreach(timeOne)
    // two full timed passes + a third rep for still-expensive queries;
    // record the per-query MIN over SUCCESSFUL reps (a contended machine
    // can only ADD time, so min holds the total within noise instead of
    // 2×). A query with no successful rep records -1 — visible in the
    // board instead of masquerading as fast.
    val rep1 = names.map(n => n -> timeOne(n)).toMap
    val rep2 = names.map(n => n -> timeOne(n)).toMap
    def minOk(ds: Seq[Double]): Double = {
      val ok = ds.filterNot(_.isNaN)
      if (ok.isEmpty) Double.NaN else ok.min
    }
    val best2 = names.map(n => n -> minOk(Seq(rep1(n), rep2(n)))).toMap
    val rep3 = names.filter(n => best2(n).isNaN || best2(n) > ExtraRepSec)
      .map(n => n -> timeOne(n)).toMap
    val results = names.map { n =>
      val best = minOk(Seq(best2(n)) ++ rep3.get(n))
      n -> (if (best.isNaN) -1.0 else best)
    }
    // per-query values rounded to ms: the full record line is ~13 KB at
    // 445 queries and every digit counts against the driver's tail capture
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The driver's BENCH_r{N}.json truncates its tail — persist the full
    // per-query record in-repo so the round audit reads one file. The
    // round number is inferred from the newest driver-written BENCH_r*.json
    // (the driver benches BEFORE writing the round's file, so this run
    // belongs to the round after the newest one). BENCH_LATEST.json is
    // the STABLE path: the driver's stdout scrape has yielded
    // "parsed": null for two rounds because Spark/sbt log lines
    // interleave with the JSON line — a fixed filename needs no scraping.
    if (only.isEmpty) {
      repoDir.foreach { repo =>
        java.nio.file.Files.write(
          repo.resolve(f"bench_full_r${currentRound(repo)}%02d.json"),
          json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        java.nio.file.Files.write(
          repo.resolve("BENCH_LATEST.json"),
          json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    // stop BEFORE printing: Spark's shutdown logging (stderr, but merged
    // with stdout under `2>&1` capture) can no longer interleave with the
    // record line, so the JSON is the last payload before sbt's trailer
    spark.stop()
    println(json)
    // The full record line is ~13 KB at 445 queries — beyond the
    // driver's 2000-char stdout tail capture, which has yielded
    // "parsed": null for two rounds. Print a SECOND, compact, FINAL
    // line that fits any tail window and points at the in-repo
    // per-query record; the full line above is unchanged (additive
    // only, per the bench contract).
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"per_query_file":"BENCH_LATEST.json","sf":"$sfDir"}""")
    System.out.flush()
  }
}
