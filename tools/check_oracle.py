#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Replays what the driver does: run each oracle_sql.json query in DuckDB over
the same parquet tables, load the engine's parquet output, sort columns by
name, and compare values exactly (with dtype normalization: timestamps to
microseconds, integers to int64). This is builder-side tooling only — the
engine itself never depends on DuckDB/pandas.
"""
import sys, json, glob, os
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    for c in df.columns:
        k = df[c].dtype.kind
        if k == "M":
            df[c] = df[c].astype("datetime64[us]")
        elif k in "iu":
            df[c] = df[c].astype("int64")
        elif k == "b":
            df[c] = df[c].astype("bool")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # optional third arg: comma-separated name-prefix filter, the same
    # contract as graft.Verify's -- check only the queries just dumped
    # instead of replaying all 226 oracle SQLs for a one-query iteration
    prefixes = [p for p in (sys.argv[3].split(",") if len(sys.argv) > 3
                            else []) if p]
    names = [n for n in sorted(oracle)
             if not prefixes or any(n.startswith(p) for p in prefixes)]
    n_pass = n_fail = 0
    for name in names:
        try:
            exp = normalize(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no engine output")
            n_fail += 1
            continue
        got = normalize(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        bad = []
        for c in exp.columns:
            e, g = exp[c].values, got[c].values
            if e.dtype.kind == "f":
                ef, gf = e.astype(float), g.astype(float)
                eq = (ef == gf) | (np.isnan(ef) & np.isnan(gf))
                # Driver-faithful signed-zero strictness: the driver's
                # compare hashes VALUES BITWISE, where -0.0 != +0.0, but
                # numpy's == treats them equal -- exactly the gap that
                # kept q220 local-green while driver-red for two rounds
                # (DuckDB round() of a -1e-14 cancellation emits -0.0;
                # Spark's BigDecimal round emits +0.0). Re-check the
                # sign bit wherever both sides are zero.
                zero = eq & (ef == 0.0)
                eq = eq & (~zero | (np.signbit(ef) == np.signbit(gf)))
            else:
                eq = (e == g) | (pd.isna(e) & pd.isna(g))
            if not eq.all():
                i = int(np.argmin(eq))
                bad.append(f"{c}[row {i}]: exp={e[i]!r} got={g[i]!r} ({int((~eq).sum())} diffs)")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad[:3]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    missing = sorted(set(os.path.basename(d) for d in glob.glob(f"{outdir}/*")
                         if os.path.isdir(d)) - set(oracle))
    if missing:
        print(f"NOTE rows-only (no oracle): {missing}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
