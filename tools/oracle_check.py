"""Local replica of the driver's correctness gate: run every catalog query
on Spark and its oracle on DuckDB, compare row count + schema + sorted
values. Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from etl_workflows_spark.queries import ORACLE_SQL, QUERIES
from etl_workflows_spark.queries.base import TABLES
from etl_workflows_spark.session import get_spark


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        # ns-vs-us pandas unit is a transport artifact, not a value diff
        if str(df[col].dtype).startswith("datetime64"):
            df[col] = df[col].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _values_equal(a, b) -> bool:
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def compare(spark_df, oracle_df) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"rowcount spark={len(spark_df)} oracle={len(oracle_df)}")
    a, b = _canon(spark_df), _canon(oracle_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"columns spark={list(a.columns)} oracle={list(b.columns)}")
        return problems
    if list(a.dtypes) != list(b.dtypes):
        problems.append(f"dtypes spark={dict(a.dtypes)} oracle={dict(b.dtypes)}")
    if not problems:
        for col in a.columns:
            av, bv = a[col].tolist(), b[col].tolist()
            bad = [
                (i, x, y)
                for i, (x, y) in enumerate(zip(av, bv))
                if not _values_equal(x, y)
            ]
            if bad:
                problems.append(f"col {col}: {len(bad)} mismatches, first {bad[:3]}")
    return problems


def main():
    # Usage: oracle_check.py [sf_dir] [--out artifact.json] [query ...]
    import json

    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    n_pass = n_fail = n_rows_only = 0
    results: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {e}")
            results[name] = {"status": "fail", "err": f"spark error {e}"}
            n_fail += 1
            continue
        if name not in ORACLE_SQL:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle)")
            results[name] = {"status": "rows_only", "spark_rows": len(sdf)}
            n_rows_only += 1
            continue
        try:
            odf = con.execute(ORACLE_SQL[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error {e}")
            results[name] = {"status": "fail", "err": f"oracle error {e}"}
            n_fail += 1
            continue
        problems = compare(sdf, odf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            results[name] = {"status": "fail", "err": "; ".join(problems)}
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows")
            results[name] = {
                "status": "pass",
                "spark_rows": len(sdf),
                "oracle_rows": len(odf),
            }
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": n_rows_only,
                    "results": results,
                },
                f,
                indent=1,
            )
        print(f"artifact written: {out_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
