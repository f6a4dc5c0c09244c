#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Loads each <out>/<name> parquet (Spark result), runs the matching
oracle_sql.json entry in DuckDB over the sf tables, then compares:
columns sorted by name, rows sorted by all columns, exact value match
(with a small float report so near-misses are visible).

Driver-side tooling only — the Scala library never depends on this.
"""
import sys, json, glob, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable sort across dtypes; keep originals for compare
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="first").reset_index(drop=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    spark_dirs = {p.rstrip("/").split("/")[-1]
                  for p in glob.glob(f"{out_dir}/*/")}
    n_pass = n_fail = 0
    for name in sorted(spark_dirs):
        parts = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not parts:
            print(f"FAIL {name}: no spark output parquet"); n_fail += 1; continue
        sdf = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows={len(sdf)})"); continue
        try:
            ddf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        s, d = normalize(sdf), normalize(ddf)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
            n_fail += 1; continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); n_fail += 1; continue
        bad = []
        for c in s.columns:
            a, b = s[c], d[c]
            # Driver hashes TYPED values: a Spark int64 vs a DuckDB HUGEINT
            # (pandas-coerced to float64/object) must FAIL here even when the
            # numeric values agree. Compare dtype kinds strictly.
            if a.dtype.kind != b.dtype.kind:
                bad.append(f"{c}: dtype kind mismatch spark={a.dtype} "
                           f"oracle={b.dtype} (driver hash would differ)")
                continue
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                aa, bb = a.astype(float).to_numpy(), b.astype(float).to_numpy()
                exact = np.array_equal(aa, bb, equal_nan=True)
                if not exact:
                    close = np.allclose(aa, bb, rtol=1e-12, atol=1e-12, equal_nan=True)
                    mx = np.nanmax(np.abs(aa - bb)) if len(aa) else 0
                    bad.append(f"{c}: float mismatch (close={close}, maxdiff={mx:.3g})")
            else:
                if not a.astype(object).where(pd.notna(a), None).equals(
                        b.astype(object).where(pd.notna(b), None)):
                    neq = (a.astype(str) != b.astype(str)).sum()
                    bad.append(f"{c}: {neq} differing values "
                               f"(e.g. {a.iloc[0]!r} vs {b.iloc[0]!r})")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad)); n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows, {len(s.columns)} cols)"); n_pass += 1
    missing = set(oracle) - spark_dirs
    for name in sorted(missing):
        print(f"FAIL {name}: oracle present but no spark output"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(spark_dirs - set(oracle))} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
