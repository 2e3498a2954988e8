#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verifyOutDir> <sfDir>

Reads <verifyOutDir>/oracle_sql.json, registers every fixture parquet as a
DuckDB view named after the table, runs each oracle SQL, and compares
against the Spark-written parquet in <verifyOutDir>/<name>/ — columns
sorted by name, rows sorted by all columns, exact value compare (floats
bit-exact, with a reported max-abs-diff fallback so near-misses are
diagnosable). Mirrors the strictest plausible driver compare, so passing
here should imply passing the real gate.

(Local dev tool only — not part of the Scala library.)
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp-ish columns to int64 micros for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> str:
    a, b = norm(spark_df), norm(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"FAIL cols spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"FAIL rows spark={len(a)} oracle={len(b)}"
    worst = 0.0
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype("float64")
            bv = bv.astype("float64")
            both_nan = av.isna() & bv.isna()
            diff = (av - bv).abs()
            diff[both_nan] = 0.0
            if not (av.fillna(1.23456e300) == bv.fillna(1.23456e300)).all():
                m = float(diff.max())
                worst = max(worst, m if not math.isnan(m) else float("inf"))
        else:
            if not (av.fillna("\x00NA") == bv.fillna("\x00NA")).all():
                bad = (av.fillna("\x00NA") != bv.fillna("\x00NA"))
                i = bad.idxmax()
                return f"FAIL col {c} row {i}: spark={av[i]!r} oracle={bv[i]!r}"
    if worst > 0:
        return f"FLOATDIFF max_abs={worst:.3e}"
    return "OK"


def main() -> None:
    out_dir, sf_dir = Path(sys.argv[1]), sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ORACLE-ERROR {e}")
            continue
        pdir = out_dir / name
        files = list(pdir.glob("*.parquet")) if pdir.exists() else []
        if not files:
            print(f"{name:28s} NO-SPARK-OUTPUT")
            continue
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        res = compare(name, sdf, odf)
        if res == "OK":
            n_ok += 1
        print(f"{name:28s} {res}   ({len(odf)} rows)")
    print(f"-- {n_ok}/{len(oracle)} OK")


if __name__ == "__main__":
    main()
