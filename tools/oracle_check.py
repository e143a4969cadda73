"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column names, and order-insensitive values
(floats to 1e-9 relative tolerance).  Usage:

    python tools/oracle_check.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    sort_cols = list(df.columns)
    return df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-12)
    return str(a) == str(b)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count differ: spark={len(spark_df)} oracle={len(oracle_df)}")
    a, b = _norm(spark_df), _norm(oracle_df)
    n = min(len(a), len(b))
    mismatches = 0
    for i in range(n):
        for c in a.columns:
            if not _values_equal(a.iloc[i][c], b.iloc[i][c]):
                if mismatches < 3:
                    problems.append(
                        f"row {i} col {c}: spark={a.iloc[i][c]!r} oracle={b.iloc[i][c]!r}"
                    )
                mismatches += 1
    if mismatches > 3:
        problems.append(f"... {mismatches} value mismatches total")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from scheduler_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", parallelism=8)
    con = _duck(sf_dir)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed, passed, skipped = [], [], []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failed.append((name, [f"spark error: {e}"]))
            continue
        if name not in oracles:
            skipped.append((name, len(sdf)))
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failed.append((name, [f"duckdb error: {e}"]))
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failed.append((name, problems))
        else:
            passed.append((name, len(sdf)))

    for name, n in passed:
        print(f"PASS  {name} ({n} rows)")
    for name, n in skipped:
        print(f"SKIP  {name} (no oracle; {n} rows)")
    for name, problems in failed:
        print(f"FAIL  {name}")
        for p in problems:
            print(f"      {p}")
    print(f"\n{len(passed)} passed, {len(skipped)} rows-only, {len(failed)} failed")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
