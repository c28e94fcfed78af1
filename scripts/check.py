#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet produced by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB against the parquet
tables in <sf_dir>, and compares: columns sorted by name, rows sorted,
values hashed. Reports per-query match plus first diff for debugging.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    # The driver hashes RAW dtypes (no canonicalization): a DuckDB HUGEINT
    # coming back as object/float64 vs Spark's int64 is a hash FAIL there,
    # so it must be a fail here too. Only sort columns and rows.
    df = df.reindex(sorted(df.columns), axis=1)
    key = {c: (df[c].astype(str) if df[c].dtype == object else df[c])
           for c in df.columns}
    order = pd.DataFrame(key).sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)

def dtype_kind(s: pd.Series) -> str:
    if pd.api.types.is_float_dtype(s): return "float"
    if pd.api.types.is_integer_dtype(s): return "int"
    if pd.api.types.is_bool_dtype(s): return "bool"
    # the driver's hash is precision-tolerant for timestamps (q44's
    # ns-vs-us window_start passes there), so treat all datetime64 alike
    if pd.api.types.is_datetime64_any_dtype(s): return "datetime"
    return str(s.dtype)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    only = sys.argv[3:] or None
    for name in sorted(oracles):
        if only and name not in only:
            continue
        sql = oracles[name]
        pq_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{pq_dir}/*.parquet")
        if not files:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            # ignore_index: duplicate RangeIndex labels across part files
            # would make canon's .loc[order] duplicate and interleave rows
            got = canon(pd.concat([pd.read_parquet(f) for f in files],
                                  ignore_index=True))
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        if list(got.columns) != list(want.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(got.columns)} oracle={list(want.columns)}"
            continue
        if len(got) != len(want):
            results[name] = f"ROWCOUNT spark={len(got)} oracle={len(want)}"
            continue
        dt_bad = [f"{c}: spark={dtype_kind(got[c])} oracle={dtype_kind(want[c])}"
                  for c in got.columns
                  if dtype_kind(got[c]) != dtype_kind(want[c])]
        if dt_bad:
            results[name] = "DTYPE_MISMATCH " + "; ".join(dt_bad[:4])
            continue
        diffs = []
        for c in got.columns:
            a, b = got[c].values, want[c].values
            if np.issubdtype(a.dtype, np.floating):
                # driver hash-compares, so -0.0 != +0.0 there; mirror that
                signed_zero = (a == 0) & (b == 0) & (np.signbit(a) != np.signbit(b))
                bad = ~(np.isclose(a, b, rtol=0, atol=0, equal_nan=True)) | signed_zero
                exact = bad.sum()
                close_bad = (~np.isclose(a, b, rtol=1e-12, atol=1e-9, equal_nan=True)).sum()
                if exact:
                    diffs.append(f"{c}: {exact} exact diffs ({close_bad} beyond 1e-9)"
                                 + (f" e.g. {a[bad][0]!r} vs {b[bad][0]!r}" if exact else ""))
            else:
                bad = a != b
                if bad.sum():
                    diffs.append(f"{c}: {bad.sum()} diffs e.g. {a[bad][0]!r} vs {b[bad][0]!r}")
        results[name] = "OK" if not diffs else "VALUE_DIFF " + "; ".join(diffs[:3])
    npass = sum(1 for v in results.values() if v == "OK")
    for k, v in results.items():
        print(f"{'PASS' if v=='OK' else 'FAIL'} {k}: {v}")
    print(f"\n{npass}/{len(results)} queries match")
    sys.exit(0 if npass == len(results) else 1)

if __name__ == "__main__":
    main()
