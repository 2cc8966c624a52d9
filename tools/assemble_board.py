#!/usr/bin/env python3
"""Assemble a board record (bench_full_r{N}.json / BENCH_LATEST.json)
from N full board passes: per-query MIN over passes (each pass is
itself a min-of-reps; contention only adds time), total = sum of mins.

Output stays in the machine-written FLAT compact format
(`"queries":{name:sec,...}`) that Bench.boardQueries requires, with an
`estimator` field naming the construction and a `passes` count per the
round-12 brief. Queries present in only some passes (a registry that
grew between passes) carry the min over the passes that have them; the
per-query pass count is recorded in `"pass_counts"` ONLY for queries
seen in fewer than all passes, so the record stays honest about its
thinner entries without bloating the common case.

Usage: python3 tools/assemble_board.py OUT pass1.json [pass2.json ...]
"""
import sys, json

out, passes = sys.argv[1], sys.argv[2:]
recs = [json.load(open(p)) for p in passes]
names = []
for r in recs:
    for k in r["queries"]:
        if k not in names:
            names.append(k)
queries, counts = {}, {}
for k in names:
    vals = [r["queries"][k] for r in recs if k in r["queries"]]
    vals = [v for v in vals if v >= 0]  # -1 = failed rep, never the min
    queries[k] = min(vals) if vals else -1.0
    n = sum(1 for r in recs if k in r["queries"])
    if n < len(recs):
        counts[k] = n
total = sum(v for v in queries.values() if v >= 0)
sink = recs[0].get("sink", "noop")
qs = ",".join('"%s":%s' % (k, repr(queries[k])) for k in names)
extra = ""
if counts:
    extra = ',"pass_counts":{%s}' % ",".join(
        '"%s":%d' % (k, v) for k, v in sorted(counts.items()))
rec = ('{"metric":"total","value":%s,"unit":"sec",'
       '"estimator":"per-query min over %d full board passes (each itself '
       'a min-of-reps), sink=%s; pass totals %s s",'
       '"passes":%d%s,"queries":{%s},"sf":"%s"}'
       % (repr(total), len(passes), sink,
          " / ".join("%.1f" % r["value"] for r in recs),
          len(passes), extra, qs, recs[0]["sf"]))
with open(out, "w") as f:
    f.write(rec)
print("assembled %d queries, total %.1f s from passes: %s"
      % (len(names), total, ", ".join("%.1f" % r["value"] for r in recs)))
if counts:
    print("thin entries (fewer passes):",
          ", ".join("%s=%d" % kv for kv in sorted(counts.items())))
