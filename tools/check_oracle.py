#!/usr/bin/env python3
"""Self-check: replicate the driver's DuckDB-oracle compare locally.

Usage: python3 tools/check_oracle.py [--exact] <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json, runs the SQL in DuckDB
(tables = parquet files in sfDir), loads the Spark result parquet, sorts
columns by name, sorts rows, and compares values (floats to 1e-9 rel).

--exact replicates the driver's hash strictness:
  * floats must be BIT-identical (including signed zero);
  * every other column is compared via its canonical string form;
  * a dtype mismatch between the two sides (e.g. DuckDB DECIMAL ->
    float64 vs Spark DECIMAL -> object[Decimal]) is itself a FAIL,
    because the driver hashes each side's own canonical form and
    "equal values, different canonical form" still red-flags.
    This is exactly the r2 j2 lesson: keep DECIMAL/format-ambiguous
    types OFF the compare surface (cast to DOUBLE on both sides).
"""
import json
import sys

import duckdb
import numpy as np
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


def compare_col(oc: pd.Series, sc: pd.Series, exact: bool):
    """Return (kind, n_bad) or None if the column matches."""
    o_float = pd.api.types.is_float_dtype(oc)
    s_float = pd.api.types.is_float_dtype(sc)
    if exact and str(oc.dtype) != str(sc.dtype):
        # Different canonical forms (Decimal object vs float64, int32 vs
        # int64, ...) hash differently driver-side even when values match.
        return (f"dtype oracle={oc.dtype} spark={sc.dtype}", len(oc))
    if o_float or s_float:
        a = oc.astype(float).to_numpy()
        b = sc.astype(float).to_numpy()
        both_nan = np.isnan(a) & np.isnan(b)
        if exact:
            # bit-for-bit: value equality AND signed-zero agreement
            eq = ((a == b) & (np.signbit(a) == np.signbit(b))) | both_nan
            if not eq.all():
                return ("float-bits", int((~eq).sum()))
            return None
        ok = np.isclose(a, b, rtol=1e-9, atol=1e-9, equal_nan=True)
        exact_eq = both_nan | (a == b)
        if not ok.all():
            return ("value", int((~ok).sum()))
        if not exact_eq.all():
            return ("float-lastbit", int((~exact_eq).sum()))
        return None
    if exact:
        na = pd.isna(oc) & pd.isna(sc)
        eq = (oc.astype(str) == sc.astype(str)) | na
    else:
        eq = (oc == sc) | (pd.isna(oc) & pd.isna(sc))
    if not eq.all():
        return ("value", int((~eq).sum()))
    return None


def main(sf_dir: str, out_dir: str, exact: bool = False) -> int:
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
                r = compare_col(o[c], s[c], exact)
                if r is not None:
                    bad.append((c,) + r)
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
    argv = [a for a in sys.argv[1:] if a != "--exact"]
    sys.exit(1 if main(argv[0], argv[1], exact="--exact" in sys.argv) else 0)
