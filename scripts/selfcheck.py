#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL and diff. Usage:
    python3 scripts/selfcheck.py <verify_out_dir> <sf_dir>
Driver-side tooling only (duckdb/pandas); NOT part of the Scala library.
"""
import duckdb, glob, json, math, os, sys

outdir, sfdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for t in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    spark_df = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf()
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fails += 1
        continue
    s, d = norm(spark_df), norm(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
        fails += 1
        continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
        fails += 1
        continue
    bad = None
    for c in s.columns:
        sv, dv = s[c], d[c]
        # Driver-faithful dtype gate: the driver hashes canonicalized
        # values, so an int column on one side arriving as float on the
        # other (e.g. DuckDB sum(BIGINT) -> HUGEINT -> pandas float64)
        # hash-mismatches ("307" vs "307.0") even when numerically equal.
        # Numeric-kind drift is therefore a FAIL here, not a tolerated
        # widening. (q103 round 5-6 went driver-red exactly this way.)
        kinds = {sv.dtype.kind, dv.dtype.kind}
        if len(kinds) > 1 and kinds <= {"i", "u", "f"}:
            bad = (f"col {c}: dtype kind drift spark={sv.dtype} "
                   f"duck={dv.dtype} (driver hash would mismatch)")
            break
        try:
            import pandas as pd
            if sv.dtype.kind == "f" or dv.dtype.kind == "f":
                eq = [(a == b) or (isinstance(a, float) and isinstance(b, float)
                      and math.isnan(a) and math.isnan(b))
                      or (a is None and b is None)
                      for a, b in zip(sv.tolist(), dv.tolist())]
            else:
                eq = (sv.astype(str) == dv.astype(str)).tolist()
        except Exception as e:
            eq = [False]
            bad = f"{c}: compare error {e}"
        if not all(eq):
            i = eq.index(False)
            bad = f"col {c} row {i}: spark={sv.iloc[i]!r} duck={dv.iloc[i]!r}"
            break
    if bad:
        print(f"FAIL {name}: {bad}")
        fails += 1
    else:
        print(f"OK   {name} ({len(s)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
