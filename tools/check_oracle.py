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


def _kind(dtype) -> str:
    """Collapse a pandas dtype to a hash-relevant kind bucket.

    The driver hashes pandas VALUE BYTES, so DuckDB HUGEINT (sum of a
    BIGINT column) arriving as float64 840.0 vs Spark's int64 840 is a
    hash mismatch even though norm_cell renders both as "840" — the
    exact failure mode of the r7 `source_mix` red row. int/uint are one
    bucket; float its own; everything else (object/bool/datetime) by
    pandas kind char.
    """
    k = dtype.kind
    return "int" if k in "iu" else ("float" if k == "f" else k)


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
    else:
        # dtype-kind audit: catches DuckDB integer-sum widening
        # (HUGEINT -> pandas float64) that string normalization hides.
        try:
            s_pd = spark_df.limit(0).toPandas()
            o_pd = con.sql(f"SELECT * FROM ({sql}) q LIMIT 0").df()
            for c in spark_cols:
                sk, ok = _kind(s_pd.dtypes[c]), _kind(o_pd.dtypes[c])
                # pandas renders nullable ints as object/float sometimes;
                # only flag the unambiguous int-vs-float disagreement.
                if {sk, ok} == {"int", "float"}:
                    problems.append(
                        f"dtype-kind: column {c!r} spark={sk} oracle={ok}"
                        " (driver hash WILL differ; CAST the oracle side)"
                    )
        except Exception as e:  # pragma: no cover - audit is best-effort
            # best-effort means best-effort: an audit-infrastructure
            # hiccup (LIMIT-0 wrap breaking on a trailing semicolon, a
            # toPandas conversion quirk) must not turn a values-green
            # row red — warn and let the value compare below decide
            # (r8 ADVICE item)
            print(
                f"  [warn] {name}: dtype-audit skipped "
                f"({type(e).__name__}: {e})",
                file=sys.stderr,
            )
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
            .replace("/opq_model/sf0.01/", f"/opq_model/{tag}/")
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
