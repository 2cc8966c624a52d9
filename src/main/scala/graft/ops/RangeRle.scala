package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fused RLE + global run numbering in ONE range shuffle — the
  * reference's adjacency-index inner loop re-expressed on Spark's range
  * partitioner (reference: per-rank RLE `_groupNodeRanges`,
  * src/index/index.cpp:114-137; cross-rank boundary merge,
  * index.cpp:142-153; run numbering by exclusive prefix sum of per-rank
  * counts, index.cpp:272-280).
  *
  * The window-based formulation (`Rle.ranges` + `Offsets.globalPosition`)
  * costs a hash shuffle for the RLE window plus a range shuffle + sample
  * pass + broadcast join for the numbering. This operator does both in
  * one pass over one range shuffle:
  *
  *   1. range-partition `(dir, node, pos)` and sort within partitions —
  *      Catalyst's RangePartitioning IS the reference's
  *      `MPI_Alltoallv` range exchange;
  *   2. each partition detects its maximal consecutive-`pos` runs
  *      imperatively (sorted input → a running counter, no window);
  *   3. a per-PARTITION summary (first/last key+pos, run counts, last
  *      run's start) is gathered to the driver — bounded by the number
  *      of partitions, never the data, exactly the reference's
  *      `MPI_Allgather` of rank boundaries — and a linear walk resolves
  *      runs straddling partition boundaries and assigns each partition
  *      its run-number prefix;
  *   4. a second pass over the cached sorted partitions emits each run
  *      once (the partition where a straddling run ENDS owns it) with
  *      its global 0-based number, per `dir` group.
  *
  * At 1000 executors the driver-side state is a few thousand summary
  * rows; every data-sized structure stays distributed.
  */
object RangeRle {

  /** Per-partition boundary summary (the MPI_Allgather payload). */
  private[ops] case class PartSummary(
      pid: Int, nRows: Long, nRuns: Long, nRunsDir0: Long,
      firstDir: Int, firstNode: Long, firstPos: Long,
      lastDir: Int, lastNode: Long, lastPos: Long, lastRunStart: Long)

  /** Per-partition resolution computed by the driver walk. */
  private[ops] case class PartPlan(
      continues: Boolean,   // partition's first run continues the previous non-empty partition's last run
      mergedStart: Long,    // true start of that continued run (chain-walked)
      skipLast: Boolean,    // partition's last run is continued by a later partition → that one emits it
      prefix: Long)         // number of runs starting in earlier partitions

  /** `pairs` must have columns (dir: int-like, node_id: long-like,
    * pos: long-like) with `pos` globally distinct within each `dir`.
    * Returns the numbered range list
    * `(dir, node_id, range_start, range_end, range_pos)` — `range_end`
    * half-open, `range_pos` dense and 0-based WITHIN each `dir` in
    * (node_id, range_start) order — plus a cleanup thunk releasing the
    * internal cache (call after the consuming actions complete).
    */
  def numberedRanges(pairs: DataFrame): (DataFrame, () => Unit) = {
    fromSorted(pairs
      .select(col("dir").cast("int"), col("node_id").cast("long"), col("pos").cast("long"))
      .repartitionByRange(col("dir"), col("node_id"), col("pos"))
      .sortWithinPartitions(col("dir"), col("node_id"), col("pos")))
  }

  /** [[numberedRanges]] for input that is ALREADY range-partitioned and
    * sorted by `(dir, node_id, pos)` with non-overlapping partition key
    * ranges in partition-id order — skips the range exchange entirely,
    * so the RLE runs as a narrow stage over the caller's layout. The
    * canonical producer is the persisted frame of
    * [[Offsets.globalPositionStamped]] when its sort order leads with
    * the node key: `pos` is stamped in exactly that partition layout,
    * so position order, node clustering, and partition-id order all
    * agree by construction (the CsrIndex fused path). The precondition
    * is NOT checked row-by-row (that would cost the pass the caller is
    * saving); feeding an unsorted frame yields garbage ranges — use
    * [[numberedRanges]] unless the layout is yours.
    */
  def numberedRangesPresorted(pairs: DataFrame): (DataFrame, () => Unit) =
    fromSorted(pairs
      .select(col("dir").cast("int"), col("node_id").cast("long"), col("pos").cast("long")))

  private def fromSorted(prepared: DataFrame): (DataFrame, () => Unit) = {
    val spark = prepared.sparkSession
    import spark.implicits._
    val sorted: Dataset[(Int, Long, Long, Int)] = prepared
      .withColumn("_pid", spark_partition_id())
      .as[(Int, Long, Long, Int)]
      .persist(StorageLevel.MEMORY_AND_DISK)

    val summaries: Array[PartSummary] = sorted.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val (fd, fn, fp, pid) = it.next()
        // the per-dir numbering base is tracked for dir 0 only — the
        // operator is defined for the two index directions
        require(fd == 0 || fd == 1, s"dir must be 0 or 1, got $fd")
        var (ld, ln, lp) = (fd, fn, fp)
        var nRows = 1L; var nRuns = 1L
        var nRunsDir0 = if (fd == 0) 1L else 0L
        var lastRunStart = fp
        while (it.hasNext) {
          val (d, n, p, _) = it.next(); nRows += 1
          if (d != ld || n != ln || p != lp + 1) {
            nRuns += 1; if (d == 0) nRunsDir0 += 1; lastRunStart = p
          }
          ld = d; ln = n; lp = p
        }
        Iterator.single(PartSummary(pid, nRows, nRuns, nRunsDir0,
          fd, fn, fp, ld, ln, lp, lastRunStart))
      }
    }.collect().sortBy(_.pid)

    // Driver walk over ≤ #partitions summaries (index.cpp:142-153 +
    // 272-280): resolve boundary-straddling runs, assign run prefixes.
    val nParts = sorted.rdd.getNumPartitions
    val plans = new Array[PartPlan](nParts)
    var prev: PartSummary = null          // previous NON-EMPTY partition
    var prevMergedStart = 0L              // mergedStart of `prev`
    var runningPrefix = 0L
    var dir0Total = 0L
    val byPid = summaries.map(s => s.pid -> s).toMap
    for (p <- 0 until nParts) {
      byPid.get(p) match {
        case None =>
          plans(p) = PartPlan(continues = false, 0L, skipLast = false, runningPrefix)
        case Some(s) =>
          val continues = prev != null &&
            s.firstDir == prev.lastDir && s.firstNode == prev.lastNode &&
            s.firstPos == prev.lastPos + 1
          // chain walk: if prev was a single continued run, its start
          // was itself merged from further back
          val mergedStart =
            if (!continues) 0L
            else if (plans(prev.pid).continues && prev.nRuns == 1) prevMergedStart
            else prev.lastRunStart
          plans(p) = PartPlan(continues, mergedStart, skipLast = false, runningPrefix)
          if (prev != null && continues) // prev's last run ends later
            plans(prev.pid) = plans(prev.pid).copy(skipLast = true)
          runningPrefix += s.nRuns - (if (continues) 1 else 0)
          dir0Total += s.nRunsDir0 -
            (if (continues && s.firstDir == 0) 1 else 0)
          prev = s; prevMergedStart = mergedStart
      }
    }
    val bPlans = spark.sparkContext.broadcast(plans)
    val bDir0 = spark.sparkContext.broadcast(dir0Total)

    val ranges: DataFrame = sorted.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else new Iterator[(Int, Long, Long, Long, Long)] {
        private val head = it.next()
        private val pid = head._4
        private val plan = bPlans.value(pid)
        private var runIdx = 0L
        private var runDir = head._1; private var runNode = head._2
        private var runStart = head._3; private var runEnd = head._3
        private var nextRow: (Int, Long, Long, Int) = _
        private var done = false
        private var pending: (Int, Long, Long, Long, Long) = _

        private def closeRun(isLast: Boolean): Unit = {
          val continued = runIdx == 0 && plan.continues
          if (isLast && plan.skipLast) { pending = null; return }
          val start = if (continued) plan.mergedStart else runStart
          val num =
            if (continued) plan.prefix - 1
            else plan.prefix + runIdx - (if (plan.continues) 1 else 0)
          val pos = if (runDir == 0) num else num - bDir0.value
          pending = (runDir, runNode, start, runEnd + 1, pos)
        }

        private def advance(): Unit = {
          pending = null
          while (pending == null && !done) {
            if (!it.hasNext) { closeRun(isLast = true); done = true }
            else {
              val (d, n, p, _) = it.next()
              if (d != runDir || n != runNode || p != runEnd + 1) {
                closeRun(isLast = false)
                runIdx += 1
                runDir = d; runNode = n; runStart = p; runEnd = p
              } else runEnd = p
            }
          }
        }
        advance()
        override def hasNext: Boolean = pending != null
        override def next(): (Int, Long, Long, Long, Long) = {
          val r = pending; advance(); r
        }
      }
    }.toDF("dir", "node_id", "range_start", "range_end", "range_pos")
    (ranges, () => { sorted.unpersist(); () })
  }
}
