"""Per-group top-k with scale-safe parallelism (W5 family).

The one-window formulation — ``row_number() over (partition by group
order by ...)`` — is correct but its parallelism equals the number of
groups: 3 groups over 100 TB is 3 tasks each sorting a third of the
table. The standard fix is a local pre-filter: every task keeps its own
top-k per group first (the global per-group top-k is always a subset of
the union of task-local top-ks), so the final per-group window sorts at
most k × n_partitions rows regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
    local_prefilter: bool = True,
) -> DataFrame:
    """Rows ranked 1..k per group under ``order_cols``.

    ``order_cols`` must define a deterministic TOTAL order (include a
    tie-breaker key) — with ties, which rows survive the local pre-filter
    would otherwise depend on partitioning. With a total order the output
    is identical with ``local_prefilter`` on or off (tested); on is the
    default because a per-group window's parallelism is the group count,
    which a handful of giant groups turns into a handful of giant sorts.
    The pre-filter window partitions by (group, physical partition id),
    so its parallelism is the scan's, and it is narrow (no shuffle —
    spark_partition_id is stable within a task).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    out = df
    if local_prefilter:
        w_local = Window.partitionBy(
            *group_cols, F.spark_partition_id()
        ).orderBy(*order_cols)
        out = (
            out.withColumn("_local_rank", F.row_number().over(w_local))
            .where(F.col("_local_rank") <= k)
            .drop("_local_rank")
        )
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return out.withColumn(rank_col, F.row_number().over(w).cast("long")).where(
        F.col(rank_col) <= k
    )
