#!/usr/bin/env python3
"""Signed-zero / cancellation-tiny exposure scan over the oracle surface.

Usage: python3 tools/scan_signed_zero.py <sfDir> <verifyOutDir>

Background (round 16): the driver's correctness gate hashes values
BITWISE, where -0.0 != +0.0. DuckDB's round() of a tiny NEGATIVE double
(a cancellation artifact like beta = -1e-14 from an exact-fit
regression) emits -0.0, while Spark's BigDecimal-based round() emits
+0.0 — numerically equal, bitwise different. That single bit kept
q220 driver-red for two rounds while every local numeric compare was
green.

This scan runs every oracle SQL in DuckDB over the given SF and flags,
per float column:
  - NEGATIVE-ZERO cells (an exposure TODAY — fix with `+ 0.0` on both
    engines' finals, q220's recipe);
  - tiny-nonzero cells (|v| < 1e-9 — one libm ulp away from becoming a
    rounded signed zero on a different build: the watch list).
Zeros that arise as ratios of non-negative exact values (0/n) are
structurally safe (+0.0 on every engine) and are NOT flagged.

Run this after any testdata regeneration: the exposure is
data-dependent, and a clean sweep at the driver's SF is what makes
"no other query carries the q220 class" an evidence-backed claim
(round 16 measured: 0 negative-zeros, 0 tinies at sf0.001 and sf0.01
across all 229 oracle outputs).
"""
import sys, json, os
import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    # mirror check_oracle.py's calling convention: a missing arg prints
    # usage and exits 2 instead of dying with an IndexError (r16 advice)
    if len(sys.argv) < 3:
        print("usage: scan_signed_zero.py <sfdir> <verify_outdir>",
              file=sys.stderr)
        sys.exit(2)
    sfdir, outdir = sys.argv[1], sys.argv[2]
    oracle_path = f"{outdir}/oracle_sql.json"
    if not os.path.exists(oracle_path):
        print(f"missing {oracle_path} — run graft.Verify first",
              file=sys.stderr)
        sys.exit(2)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    neg = tiny = errs = 0
    for name in sorted(oracle):
        try:
            df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"ERR {name}: {e}")
            errs += 1
            continue
        for c in df.columns:
            if df[c].dtype.kind != "f":
                continue
            v = df[c].values
            z = (v == 0.0) & ~np.isnan(v)
            nz = z & np.signbit(v)
            tv = (np.abs(v) > 0) & (np.abs(v) < 1e-9)
            if nz.any():
                print(f"NEGATIVE-ZERO {name}.{c}: {int(nz.sum())} cells"
                      " — add `+ 0.0` to this final on BOTH engines")
                neg += 1
            if tv.any():
                print(f"TINY {name}.{c}: {int(tv.sum())} cells |v|<1e-9"
                      " — one ulp from a rounded signed zero")
                tiny += 1
    print(f"== negative-zeros: {neg}, tiny-nonzero: {tiny}, "
          f"sql-errors: {errs} ==")
    sys.exit(1 if (neg or errs) else 0)


if __name__ == "__main__":
    main()
