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
    """Engine-neutral rendering of one cell, applied recursively so
    floats INSIDE arrays/structs get the same 9-sig-digit tolerance as
    top-level floats (raw str() of a nested list compares full-precision
    reprs, where a 1-ulp Spark-vs-DuckDB difference false-reds the row).
    -0.0 renders as "0": numerically equal results must not red on a
    sign-preserving summation-order difference."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # collapse -0.0
        return f"{v:.9g}"
    if v is None:
        return "NULL"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if hasattr(v, "asDict"):  # pyspark Row (struct) without the import
        v = v.asDict()
    if isinstance(v, dict):  # DuckDB structs arrive as dicts
        return (
            "{"
            + ",".join(f"{k}:{norm_cell(v[k])}" for k in sorted(v))
            + "}"
        )
    return str(v)


def _kind(dtype) -> str:
    """Collapse a pandas dtype to a hash-relevant kind bucket.

    The driver hashes pandas VALUE BYTES, so DuckDB HUGEINT (sum of a
    BIGINT column) arriving as float64 840.0 vs Spark's int64 840 is a
    hash mismatch even though norm_cell renders both as "840" — the
    exact failure mode of the r7 `source_mix` red row. Width matters
    too (int32 month() vs BIGINT is 4-byte vs 8-byte value bytes), so
    numeric kinds carry their itemsize; everything else
    (object/bool/datetime) stays the pandas kind char.
    """
    k = dtype.kind
    if k in "iu":
        return f"int{dtype.itemsize * 8}"
    if k == "f":
        return f"float{dtype.itemsize * 8}"
    return k


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
                if sk == ok:
                    continue
                # pandas renders nullable ints as object sometimes; only
                # judge the unambiguous numeric-vs-numeric disagreements.
                base_s, base_o = sk.rstrip("0123456789"), ok.rstrip("0123456789")
                if {base_s, base_o} == {"int", "float"}:
                    # cross-kind: the r7 source_mix failure — the driver
                    # hash red-rows this even when strings agree.
                    problems.append(
                        f"dtype-kind: column {c!r} spark={sk} oracle={ok}"
                        " (driver hash WILL differ; CAST the oracle side)"
                    )
                elif base_s == base_o and base_s in ("int", "float"):
                    # same-kind width mismatch (int32 vs int64): the
                    # driver's gate demonstrably tolerates this
                    # (ivfpq_knn_join ran green for rounds with an
                    # int64-vs-int32 rank column), but aligned widths
                    # cost one CAST and remove the assumption — warn.
                    print(
                        f"  [warn] {name}: column {c!r} width differs "
                        f"spark={sk} oracle={ok} (driver tolerates; "
                        "consider CASTing the oracle side anyway)",
                        file=sys.stderr,
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
        from collections import Counter

        s_ctr = Counter(
            tuple(norm_cell(r[c]) for c in spark_cols) for r in spark_rows
        )
        o_ctr = Counter(
            tuple(norm_cell(r[col_idx_o[c]]) for c in spark_cols) for r in o_rows
        )
        if s_ctr != o_ctr:
            # Counter subtraction is O(n) (the old sorted-list
            # membership diff was O(n^2) — minutes on a 100k-row
            # mismatch) and keeps multiplicity: spark=[X,X,Y] vs
            # oracle=[X,Y,Y] shows X:+1 / Y:+1 instead of two
            # empty-looking diffs.
            diff_s = [
                (r, n) for r, n in (s_ctr - o_ctr).most_common(3)
            ]
            diff_o = [
                (r, n) for r, n in (o_ctr - s_ctr).most_common(3)
            ]
            problems.append(
                f"values: spark-only={diff_s} oracle-only={diff_o}"
            )
    return problems


def main():
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        print(
            f"usage: {sys.argv[0]} [sf_dir] [query ...]\n"
            f"first argument must be a testdata directory, got {sf_dir!r}",
            file=sys.stderr,
        )
        sys.exit(2)
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
    # materialized artifact bakes that tag into its path; when checking
    # other SFs locally, point every such path at the same-SF artifact.
    # One generic rewrite (instead of the old per-artifact-prefix list,
    # which silently missed any NEW materialized path and carried a dead
    # /ivf_index/ entry): any "/sf0.01/" path segment becomes the local
    # tag.
    tag = os.path.basename(os.path.normpath(sf_dir))
    if tag != "sf0.01":
        oracles = {
            k: v.replace("/sf0.01/", f"/{tag}/") for k, v in oracles.items()
        }
    unknown = only - set(qs)
    if unknown:
        print(
            f"unknown query name(s): {sorted(unknown)}\n"
            f"(registered: {sorted(qs)})",
            file=sys.stderr,
        )
        sys.exit(2)
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
