"""Local mimic of the driver's correctness gate: run every queries()
entry on Spark at sf0.01 and its oracle_sql() in DuckDB over the same
parquet, compare row count, column names, and order-insensitive values.

Usage: python tools/validate_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from t_res_spark.session import get_spark  # noqa: E402


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="gate-validate", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            if len(sdf) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL-duckdb] {name}: {str(e)[:300]}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        else:
            a, b = _canon(sdf), _canon(odf)
            if not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                bad_rows = neq.any(axis=1)
                if bad_rows.any():
                    i = bad_rows.idxmax()
                    problems.append(
                        f"values differ at canon row {i}:\n  spark={a.loc[i].to_dict()}\n  duck ={b.loc[i].to_dict()}"
                    )
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"[FAIL] {name}: {problems}")
        else:
            print(f"[ok] {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures")
    for n, p in failures:
        print(" -", n, ":", p[:500])
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
