#!/usr/bin/env python3
"""Self-check: replicate the driver's DuckDB-oracle compare locally.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json, runs the SQL in DuckDB
(tables = parquet files in sfDir), loads the Spark result parquet, sorts
columns by name, sorts rows, and compares values (floats to 1e-9 rel).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp-ish columns to ns ints for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            oracle = con.execute(sql).df()
            spark = pd.read_parquet(f"{out_dir}/{name}")
            o, s = normalize(oracle), normalize(spark)
            if list(o.columns) != list(s.columns):
                print(f"FAIL {name}: columns oracle={list(o.columns)} spark={list(s.columns)}")
                n_fail += 1
                continue
            if len(o) != len(s):
                print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}")
                n_fail += 1
                continue
            bad = []
            for c in o.columns:
                oc, sc = o[c], s[c]
                if pd.api.types.is_float_dtype(oc) or pd.api.types.is_float_dtype(sc):
                    import numpy as np
                    a = oc.astype(float).to_numpy()
                    b = sc.astype(float).to_numpy()
                    ok = np.isclose(a, b, rtol=1e-9, atol=1e-9, equal_nan=True)
                    # exact-match report too, since the driver hashes exact values
                    exact = (pd.isna(oc) & pd.isna(sc)) | (a == b)
                    if not ok.all():
                        bad.append((c, "value", int((~ok).sum())))
                    elif not exact.all():
                        bad.append((c, "float-lastbit", int((~exact).sum())))
                else:
                    eq = (oc == sc) | (pd.isna(oc) & pd.isna(sc))
                    if not eq.all():
                        bad.append((c, "value", int((~eq).sum())))
            if bad:
                print(f"FAIL {name}: {bad}")
                n_fail += 1
            else:
                print(f"OK   {name} ({len(o)} rows)")
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            n_fail += 1
    return n_fail


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
