"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB over the same
parquet tables, then compares row count, schema (loosely: pandas dtype kinds),
and an order-insensitive value comparison (sort columns by name, sort rows,
exact equality for non-floats, exact-or-ulp report for floats).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from l1dbproto_spark.queries import load_all
from l1dbproto_spark.session import get_spark
from l1dbproto_spark.sources.catalog import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # bytes/arrays -> stable repr
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    issues: list[str] = []
    if len(sdf) != len(odf):
        issues.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        issues.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return issues
    for c in sdf.columns:
        if str(sdf[c].dtype) != str(odf[c].dtype):
            print(
                f"  dtype  {name}.{c}: spark={sdf[c].dtype} oracle={odf[c].dtype}"
            )
    s, o = normalize(sdf), normalize(odf.astype({c: sdf[c].dtype for c in sdf.columns if c in odf.columns}, errors="ignore"))
    if issues:
        return issues
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if np.issubdtype(sv.dtype, np.floating):
            both_nan = pd.isna(sv) & pd.isna(ov)
            eq = (sv == ov) | both_nan
            if not eq.all():
                bad = np.flatnonzero(~eq)
                diff = np.nanmax(np.abs(sv[~eq].astype(float) - ov[~eq].astype(float)))
                issues.append(f"col {c}: {len(bad)} float mismatches, maxdiff={diff:.3e}")
        else:
            eq = (pd.isna(sv) & pd.isna(ov)) | (sv == ov)
            if not np.asarray(eq).all():
                n = int((~np.asarray(eq)).sum())
                i = int(np.flatnonzero(~np.asarray(eq))[0])
                issues.append(f"col {c}: {n} mismatches, first spark={sv[i]!r} oracle={ov[i]!r}")
    return issues


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    specs = load_all()
    spark = get_spark("check_correctness")
    con = duck_connection(sf_dir)
    failures = 0
    for name, spec in specs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.builder(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark raised\n{traceback.format_exc()}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(spec.oracle).df()
        except Exception:
            print(f"FAIL  {name}: oracle raised\n{traceback.format_exc()}")
            failures += 1
            continue
        issues = compare(name, sdf, odf)
        if issues:
            failures += 1
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]: " + "; ".join(issues))
        else:
            print(f"ok    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{failures} failures / {len(specs)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
