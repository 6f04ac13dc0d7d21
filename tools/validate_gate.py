"""Local mimic of the driver's correctness gate: run every queries()
entry on Spark at sf0.01 and its oracle_sql() in DuckDB over the same
parquet, compare row count, column names, and order-insensitive values.

The driver's own CORRECTNESS report records at most 50 queries (first
50 in dict order — VERDICT r4 #2), so this runner is the auditable
record for the full set: ``--json PATH`` writes a per-query artifact
(match flags, row counts, elapsed, loadavg) in the driver's shape,
committed as CORRECTNESS_full_r{N}.json each round.

Usage: python tools/validate_gate.py [--json out.json] [sf_dir] [query ...]
"""

from __future__ import annotations

import json
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
        # Normalize physical width before comparison: Spark hands back
        # int32/float32 where DuckDB uses int64/float64, and pandas
        # .equals() is dtype-strict — without this, equal values record
        # hash_match=False (the bug behind the r5 artifact's six
        # false "mismatch" rows).
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    args = sys.argv[1:]
    json_out = None
    if args and args[0] == "--json":
        json_out = args[1]
        args = args[2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark(app_name="gate-validate", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    record: dict = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
            "elapsed_s": None, "loadavg_1m": round(os.getloadavg()[0], 1),
        }
        record[name] = rec
        try:
            sdf = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(sdf)
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            rec["err"] = f"spark: {str(e)[:300]}"
            print(f"[FAIL-spark] {name}: {str(e)[:300]}")
            continue
        finally:
            rec["elapsed_s"] = round(time.time() - t0, 1)
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            rec["err"] = "no_oracle"
            if len(sdf) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            odf = con.sql(oracles[name]).df()
            rec["oracle_rows"] = len(odf)
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            rec["err"] = f"duckdb: {str(e)[:300]}"
            print(f"[FAIL-duckdb] {name}: {str(e)[:300]}")
            continue
        problems = []
        rec["rows_match"] = len(sdf) == len(odf)
        if not rec["rows_match"]:
            problems.append(f"rowcount {len(sdf)} vs {len(odf)}")
        rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
        if not rec["schema_match"]:
            problems.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif rec["rows_match"]:
            a, b = _canon(sdf), _canon(odf)
            rec["hash_match"] = bool(a.equals(b))
            if not rec["hash_match"]:
                neq = (a != b) & ~(a.isna() & b.isna())
                bad_rows = neq.any(axis=1)
                if bad_rows.any():
                    i = bad_rows.idxmax()
                    problems.append(
                        f"values differ at canon row {i}:\n  spark={a.loc[i].to_dict()}\n  duck ={b.loc[i].to_dict()}"
                    )
                else:
                    # equals() strict-failed with no differing cell
                    # (residual dtype/index artifact) — still a failure
                    # so console and JSON can never disagree.
                    problems.append(
                        f"equals() false with no differing cell; dtypes spark={a.dtypes.to_dict()} duck={b.dtypes.to_dict()}"
                    )
        rec["elapsed_s"] = round(time.time() - t0, 1)
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"[FAIL] {name}: {problems}")
        else:
            print(f"[ok] {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures")
    for n, p in failures:
        print(" -", n, ":", p[:500])
    if json_out:
        with open(json_out, "w") as f:
            json.dump(record, f, indent=2)
        print(f"wrote {json_out} ({len(record)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
