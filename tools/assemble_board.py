#!/usr/bin/env python3
"""Assemble a board record (bench_full_r{N}.json / BENCH_LATEST.json):

    python3 tools/assemble_board.py OUT full1.json [full2.json ...] \
        [--targeted t1.json [t2.json ...]]

FULL passes cover the whole registry; per-query value = MIN over the
full passes that ran the query (each pass is itself a min-of-reps;
contention only adds time). Queries present in only SOME full passes
(a registry that grew between passes) are listed in
`late_registry_passes`. TARGETED passes (SPARK_GRAFT_ONLY runs over
faces registered AFTER the full passes) are min-merged separately and
OVERLAID: a query appearing only in targeted passes gets that min and
is listed in `targeted_min2`. The estimator string is generated from
the actual inputs, so the record and its provenance cannot drift.

Output is the machine-written FLAT compact format
(`"queries":{name:sec,...}`) that Bench.boardQueries requires —
json.dump with compact separators keeps the queries object flat and
escapes everything.
"""
import sys, json


def load(p):
    return json.load(open(p))


def min_ok(vals):
    ok = [v for v in vals if v >= 0]     # -1 = failed rep, never the min
    return min(ok) if ok else -1.0


def main():
    out = sys.argv[1]
    rest = sys.argv[2:]
    if "--targeted" in rest:
        cut = rest.index("--targeted")
        full_paths, targ_paths = rest[:cut], rest[cut + 1:]
    else:
        full_paths, targ_paths = rest, []
    fulls = [load(p) for p in full_paths]
    targs = [load(p) for p in targ_paths]

    names, queries, late = [], {}, []
    for r in fulls:
        for k in r["queries"]:
            if k not in names:
                names.append(k)
    for k in names:
        queries[k] = min_ok([r["queries"][k] for r in fulls if k in r["queries"]])
        if sum(1 for r in fulls if k in r["queries"]) < len(fulls):
            late.append(k)

    # targeted values always min-merge (a targeted rep is as valid a
    # lower bound as a full-pass rep); `targeted` lists only the faces
    # with NO full-pass coverage — the record's thin-entry marker
    targeted = []
    for r in targs:
        for k, v in r["queries"].items():
            if v < 0:
                continue
            if k not in queries or queries[k] < 0:
                if k not in names:
                    names.append(k)
                    targeted.append(k)
                queries[k] = v
            else:
                queries[k] = min(queries[k], v)

    total = sum(v for v in queries.values() if v >= 0)
    estimator = (
        "per-query min over %d full board passes (each itself a min-of-reps), "
        "sink=noop; full-pass totals %s s" % (
            len(fulls), " / ".join("%.1f" % r["value"] for r in fulls)))
    if targs:
        estimator += (
            "; %d targeted SPARK_GRAFT_ONLY passes (idle machine) min-merge "
            "into their faces' entries" % len(targs))
        if targeted:
            estimator += (
                " — %d faces carry ONLY targeted coverage" % len(targeted))
    rec = {
        "metric": "total", "value": total, "unit": "sec",
        "estimator": estimator,
        "targeted_min2": sorted(targeted),
        "late_registry_passes": sorted(late),
        "queries": {k: queries[k] for k in names},
        "sf": fulls[0]["sf"],
    }
    with open(out, "w") as f:
        json.dump(rec, f, separators=(",", ":"))
    print("assembled %d queries, total %.1f s (%d full + %d targeted passes); "
          "targeted=%d late=%s"
          % (len(queries), total, len(fulls), len(targs),
             len(targeted), sorted(late)))


if __name__ == "__main__":
    main()
