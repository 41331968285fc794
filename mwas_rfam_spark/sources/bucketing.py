"""Bucketed-table helpers: shuffle-free co-located joins.

At 100 TB the input⋈catalog and rollup⋈membership joins repeat on the
same keys across runs; writing both sides bucketed by the join key lets
every subsequent join skip its exchange entirely (Spark reads matching
buckets pairwise). This is the persistent-layout complement to the
per-query broadcast/AQE choices documented in SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Persist a relation bucketed (and optionally sorted) by join keys.

    Bucketing requires the table catalog (saveAsTable); bucket count
    should match downstream parallelism and be identical on both sides
    of a co-located join.
    """
    writer = df.write.format(fmt).mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables — no exchange on either side
    (verify with .explain: no ShuffleExchange below the join)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
