"""Per-group quantiles: exact vs DuckDB quantile_cont, sketch error
bound vs exact."""

from __future__ import annotations

import duckdb
import pytest

from mwas_rfam_spark.operators.summary import grouped_quantiles


def test_exact_quantiles_duckdb_parity(spark, sf_dir):
    """exact=True matches DuckDB's quantile_cont per event_type on the
    real events table (same linear-interpolation definition)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_type", "value")
    got = {
        r["event_type"]: (round(r["p0.5"], 9), round(r["p0.9"], 9), round(r["p0.99"], 9))
        for r in grouped_quantiles(
            ev, "value", ["event_type"], (0.5, 0.9, 0.99), exact=True
        ).collect()
    }
    con = duckdb.connect()
    want = {
        r[0]: (round(r[1], 9), round(r[2], 9), round(r[3], 9))
        for r in con.sql(
            f"""SELECT event_type,
                       quantile_cont(value, 0.5),
                       quantile_cont(value, 0.9),
                       quantile_cont(value, 0.99)
                FROM read_parquet('{sf_dir}/events.parquet')
                GROUP BY event_type"""
        ).fetchall()
    }
    assert got == want and len(got) > 1


def test_sketch_quantiles_rank_error_bound(spark, sf_dir):
    """The Greenwald-Khanna sketch's rank error: for each estimate, the
    fraction of values below it must sit within 1/accuracy (+ slack) of
    the requested probability."""
    acc = 1_000
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("value")
    n = ev.count()
    est = grouped_quantiles(
        ev, "value", None, (0.5, 0.9), exact=False, accuracy=acc
    ).collect()[0]
    from pyspark.sql import functions as F

    for p in (0.5, 0.9):
        v = est[f"p{p:g}"]
        rank = ev.where(F.col("value") <= v).count() / n
        assert abs(rank - p) <= 2.0 / acc + 1.0 / n, (p, v, rank)


def test_quantiles_validation(spark):
    df = spark.range(10).selectExpr("id as value")
    with pytest.raises(ValueError):
        grouped_quantiles(df, "value", probabilities=())
    with pytest.raises(ValueError):
        grouped_quantiles(df, "value", probabilities=(1.5,))
