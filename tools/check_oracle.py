"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet tables,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if v is None:
        return "NULL"
    return str(v)


def compare(name, spark_df, con, sql):
    spark_rows = spark_df.collect()
    spark_cols = sorted(spark_df.columns)
    oracle = con.sql(sql)
    o_cols = sorted(oracle.columns)
    o_rows = oracle.fetchall()
    col_idx_o = {c: i for i, c in enumerate(oracle.columns)}

    problems = []
    if spark_cols != o_cols:
        problems.append(f"schema: spark={spark_cols} oracle={o_cols}")
    if len(spark_rows) != len(o_rows):
        problems.append(f"rowcount: spark={len(spark_rows)} oracle={len(o_rows)}")
    if not problems:
        s_set = sorted(
            tuple(norm_cell(r[c]) for c in spark_cols) for r in spark_rows
        )
        o_set = sorted(
            tuple(norm_cell(r[col_idx_o[c]]) for c in spark_cols) for r in o_rows
        )
        if s_set != o_set:
            diff_s = [r for r in s_set if r not in o_set][:3]
            diff_o = [r for r in o_set if r not in s_set][:3]
            problems.append(f"values: spark-only={diff_s} oracle-only={diff_o}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from mwas_rfam_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # the driver's gate always runs at sf0.01, so oracle SQL that reads a
    # materialized index bakes that tag into its path; when checking other
    # SFs locally, point it at the same-SF index instead
    import os

    tag = os.path.basename(os.path.normpath(sf_dir))
    if tag != "sf0.01":
        oracles = {
            k: v.replace("/ivf_index/sf0.01/", f"/ivf_index/{tag}/")
            .replace("/ivfpq_index/sf0.01/", f"/ivfpq_index/{tag}/")
            .replace("/drift_pca/sf0.01/", f"/drift_pca/{tag}/")
            for k, v in oracles.items()
        }
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                n = df.count()
                print(f"  [rows-only] {name}: {n} rows")
                continue
            problems = compare(name, df, con, oracles[name])
        except Exception as e:
            problems = [f"EXCEPTION: {type(e).__name__}: {str(e)[:400]}"]
        if problems:
            n_fail += 1
            print(f"✗ {name}")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"✓ {name}")
    print(f"\n{'FAIL' if n_fail else 'OK'} ({n_fail} failing)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
