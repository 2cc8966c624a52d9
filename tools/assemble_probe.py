#!/usr/bin/env python3
"""Assemble scale_probe_r{N}.json from N full ScaleProbe passes:
per-query MIN over passes on each side (contention only adds time),
ratio recomputed from the mins, same_plan = True only if every pass
reported the same executed-plan skeleton at both scales.

Usage: python3 tools/assemble_probe.py OUT pass1.json [pass2.json ...]
Each passK.json holds the one-line {"metric":"scale_probe_10x",...}
record a full `runMain graft.ScaleProbe` prints.
"""
import sys, json

out, passes = sys.argv[1], sys.argv[2:]
recs = [json.load(open(p)) for p in passes]
names = []
for r in recs:
    for k in r["queries"]:
        if k not in names:
            names.append(k)
queries = {}
for k in names:
    entries = [r["queries"][k] for r in recs if k in r["queries"]]
    a = min(e["sf01_sec"] for e in entries)
    b = min(e["x10_sec"] for e in entries)
    queries[k] = {
        "sf01_sec": round(a, 3),
        "x10_sec": round(b, 3),
        "ratio": round(b / a, 3),
        "same_plan": all(e["same_plan"] for e in entries),
        "passes": len(entries),
    }
rec = {
    "metric": recs[0]["metric"],
    "unit": "sec",
    "passes": len(passes),
    "estimator": "per-query min over %d full passes, ratio from mins" % len(passes),
    "queries": queries,
}
json.dump(rec, open(out, "w"), indent=1)
over = sorted(((v["ratio"], k) for k, v in queries.items()), reverse=True)[:8]
print("top ratios:", *("%s=%.2f" % (k, r) for r, k in over))
print("families:", len(queries), "-> wrote", out)
