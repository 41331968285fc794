"""Interval (range) joins — the time-window pairing primitive the
reference lacks (SURVEY.md §2.3 J8 "absent in reference") but any
event-shaped analytics workload needs.

A naive |ts_a - ts_b| <= tol theta join is a cross product; the scalable
relational form buckets time by the tolerance and equi-joins adjacent
buckets: a qualifying pair differs by at most one bucket, so exploding
ONE side to its three candidate buckets turns the theta join into an
equi-join with a residual filter. Each qualifying pair matches exactly
once (the non-exploded side's bucket is a single value), so no dedup
pass is needed. Cost scales with events-per-bucket collisions, never n².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_within(
    a: DataFrame,
    b: DataFrame,
    tolerance: int,
    ts_col: str = "ts",
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """All (a, b) row pairs with |a.ts - b.ts| <= tolerance.

    ``ts_col`` must be a numeric timeline in both inputs (e.g. epoch
    nanos); ``tolerance`` is in the same unit. Output columns are the
    inputs' columns suffixed, plus ``abs_delta``.

    Bucketing uses integer `div`, not `/`+floor: Spark's `/` is double
    division, and epoch-nanos timelines (~1.7e18) exceed 2^53, so the
    quotient would lose precision before floor — a pair within a few
    hundred ns of a bucket boundary could land two buckets apart and be
    silently dropped by the ±1 candidate expansion.
    """
    if tolerance < 1:
        raise ValueError(f"tolerance must be a positive integer, got {tolerance}")
    sa, sb = suffixes

    def _bucket(col: str):
        # integer `div` truncates toward zero, which merely widens the
        # zero-straddling bucket to 2·tol-1; every bucket still spans
        # >= tol, so a qualifying pair is never more than one bucket away
        return F.expr(f"`{col}` div {int(tolerance)}")

    left = a.select([F.col(c).alias(c + sa) for c in a.columns]).withColumn(
        "bucket", _bucket(ts_col + sa)
    )
    right = (
        b.select([F.col(c).alias(c + sb) for c in b.columns])
        .withColumn("b0", _bucket(ts_col + sb))
        .select(
            "*",
            F.explode(
                F.array(F.col("b0") - 1, F.col("b0"), F.col("b0") + 1)
            ).alias("bucket"),
        )
        .drop("b0")
    )
    return (
        left.join(right, "bucket")
        .withColumn(
            "abs_delta", F.abs(F.col(ts_col + sa) - F.col(ts_col + sb))
        )
        .where(F.col("abs_delta") <= tolerance)
        .drop("bucket")
    )
