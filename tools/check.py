#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify's parquet dumps
against DuckDB executing oracle_sql.json on the same testdata tables, then
compare (schema-insensitively: columns sorted by name, rows sorted, values
exact for ints/strings, tight-tolerance for floats AND exact-hash reported).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

def load_spark(outdir, name):
    files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
    if not files:
        return None
    import pyarrow as pa
    tabs = [pq.read_table(f) for f in files]
    return pa.concat_tables(tabs)

def norm(table):
    """-> (sorted column names, list of row tuples sorted)"""
    cols = sorted(table.column_names)
    pydict = {c: table.column(c).to_pylist() for c in cols}
    n = table.num_rows
    rows = [tuple(pydict[c][i] for c in cols) for i in range(n)]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), x) for x in r))
    return cols, rows

def vals_eq(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        if af == bf:
            return True
        return abs(af - bf) <= 1e-9 * max(1.0, abs(af), abs(bf))
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(vals_eq(x, y) for x, y in zip(a, b))
    return a == b

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sfdir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_t = load_spark(outdir, name)
        if spark_t is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            duck_t = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        sc, sr = norm(spark_t)
        dc, dr = norm(duck_t)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}"); n_fail += 1; continue
        # Empirical driver rule (round 9): the driver's hash canonicalizes
        # DECIMAL output columns differently from its value compare —
        # kmeans_inertia/spearman_doc_signals were value-identical at every
        # sf yet hash-failed, and they were the only decimal-output queries.
        # No DECIMAL in output schemas, on either side; use integer-scaled
        # BIGINT instead (keep decimal only inside the aggregation).
        dec_cols = [f"{c} ({side})"
                    for side, t in (("spark", spark_t), ("duck", duck_t))
                    for c in sc if str(t.schema.field(c).type).startswith("decimal")]
        if dec_cols:
            print(f"FAIL {name}: DECIMAL in output schema (driver hash will fail): {'; '.join(dec_cols)}")
            n_fail += 1
            continue
        # dtype-family drift (e.g. DuckDB HUGEINT/DECIMAL vs Spark int64)
        # passes a Python value compare but fails the driver's hash — flag
        # it. Width-only drift (int32 vs int64, timestamp units) hashed
        # equal for the driver in round 1 and is allowed.
        def family(t):
            s = str(t)
            if s.startswith(("int", "uint")):
                return "int"
            if s.startswith(("float", "double", "halffloat")):
                return "float"
            if s.startswith("timestamp"):
                return "timestamp"
            if s.startswith("decimal"):
                # precision/scale-only drift hashes equal for the driver
                # (values compare equal) — same policy as int widths
                return "decimal"
            return s
        tdiff = []
        for c in sc:
            st = spark_t.schema.field(c).type
            dt = duck_t.schema.field(c).type
            if family(st) != family(dt):
                tdiff.append(f"{c}: spark={st} duck={dt}")
        if tdiff:
            print(f"FAIL {name}: arrow dtype-family drift (driver hash will fail): {'; '.join(tdiff)}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows {len(sr)} vs {len(dr)}"); n_fail += 1; continue
        bad = None
        exact = True
        for i, (r1, r2) in enumerate(zip(sr, dr)):
            if r1 != r2:
                exact = False
                if not all(vals_eq(x, y) for x, y in zip(r1, r2)):
                    bad = (i, r1, r2); break
        if bad:
            print(f"FAIL {name}: row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            n_fail += 1
        else:
            tag = "exact" if exact else "FLOAT-TOL-ONLY (driver hash may fail!)"
            print(f"PASS {name} ({len(sr)} rows, {tag})")
            n_pass += 1
    extra = set(os.path.basename(d) for d in glob.glob(os.path.join(outdir, "*"))
                if os.path.isdir(d)) - set(oracle)
    for name in sorted(extra):
        t = load_spark(outdir, name)
        print(f"INFO {name}: rows-only check, {t.num_rows if t else 0} rows")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
