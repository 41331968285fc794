"""Skew-mitigation utilities: salted joins for hot keys.

AQE's skew-join split (enabled in session.get_spark) handles sort-merge
skew automatically; salting is the explicit fallback for the cases AQE
can't rewrite — e.g. a hot build side in a broadcast-ineligible join, or
deterministic layout requirements. The salt fans a hot key into
``salt_buckets`` sub-keys on the big side and replicates only the small
side's matching rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's key salted into ``salt_buckets``
    sub-partitions and the small side replicated across them.

    Semantics identical to ``big.join(small, on, how)`` for inner/left
    joins on an equi-key. The salt is derived from xxhash64 of the big
    side's full row (deterministic, uniform) — never rand(), so retries
    and resumed stages stay consistent.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left equi-joins")
    big_cols = big.columns
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big_cols]), F.lit(salt_buckets)).cast("int")
    )
    replicated_small = small.crossJoin(
        F.broadcast(
            small.sparkSession.range(salt_buckets).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = salted_big.join(replicated_small, [on, "__salt"], how)
    return out.drop("__salt")
