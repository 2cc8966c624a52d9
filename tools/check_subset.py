#!/usr/bin/env python3
"""check.py over only the queries actually dumped into <verifyOutDir> —
local-iteration companion: Verify with SPARK_GRAFT_VERIFY_ONLY dumps a
subset, then this trims oracle_sql.json to the present outputs and
delegates to check.py's main. Usage: check_subset.py <sfDir> <outDir>."""
import sys, os, json, glob, shutil, tempfile

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    present = {os.path.basename(d) for d in glob.glob(os.path.join(outdir, "*"))
               if os.path.isdir(d)}
    trimmed = {k: v for k, v in oracle.items() if k in present}
    tmp = tempfile.mkdtemp(prefix="check_subset_")
    try:
        for name in present:
            os.symlink(os.path.abspath(os.path.join(outdir, name)),
                       os.path.join(tmp, name))
        with open(os.path.join(tmp, "oracle_sql.json"), "w") as f:
            json.dump(trimmed, f)
        sys.argv = [sys.argv[0], sfdir, tmp]
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "check", os.path.join(os.path.dirname(__file__), "check.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)  # __name__ is "check", so check.py's
        # __main__ guard does NOT fire during exec_module; the explicit
        # mod.main() below is the sole invocation
        mod.main()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

if __name__ == "__main__":
    main()
