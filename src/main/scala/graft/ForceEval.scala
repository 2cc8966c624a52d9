package graft

import org.apache.spark.sql.DataFrame

/** The timing sink for every measurement harness (Bench board mode,
  * Bench isolated mode, ScaleProbe).
  *
  * `df.count()` is NOT a valid forcing action for timing: Catalyst
  * prunes everything a count does not need, and two whole face classes
  * collapse to near-empty plans under it —
  *
  *   - a GLOBAL (no-groupBy) aggregate face: `count()` over it knows
  *     the cardinality is 1, so every aggregate expression AND the
  *     joins/exchanges feeding them are pruned (machine-verified:
  *     `dedup_paragraph_checksum.groupBy().count()` optimizes to
  *     Aggregate[count(1)] over Aggregate[] over a bare parquet
  *     relation — the md5/winner-join/reconstruct chain is GONE, and
  *     the probe measured 0.40 s at 100× where the real face takes
  *     29 s);
  *   - a LEFT JOIN whose right side has provably-unique keys (any
  *     groupBy output): the join is cardinality-preserving, so count()
  *     eliminates it and the whole chain beneath it (the
  *     dedup_paragraph_keepfirst find, same round).
  *
  * Writing to the `noop` datasource consumes every output row of the
  * FULL plan on the executors — no count rewrite, no driver collect,
  * no RDD conversion overhead — so the timed work is exactly the work
  * the face claims to do. (The r14 sonata_h5_v2_scan_agg face exists
  * because count() also pushes down into V2 connectors; this helper
  * closes the same blind-spot class at the harness instead of
  * per-face.)
  */
object ForceEval {
  def run(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
}
