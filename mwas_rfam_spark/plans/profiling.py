"""One-pass table profiling — the data-quality primitive a pipeline
operator reaches for before trusting a new drop of corpus data.

Everything is a single aggregate pass: per-column null counts, HLL++
distinct estimates (``approx_count_distinct`` — the sketch merges
map-side, so the exchange carries one sketch per partition, not values),
min/max, and numeric moments. No collect of data — the output is one row
per column, computed from one job regardless of table width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal"}


def profile_table(df: DataFrame, rsd: float = 0.05) -> DataFrame:
    """(column, dtype, n_rows, n_nulls, null_frac, approx_distinct,
    min_value, max_value, mean, stddev) — one row per profilable column,
    from ONE aggregate pass.

    min/max/mean/stddev are emitted for numeric columns (strings get
    min/max only, as strings); complex types (arrays/structs/binary) get
    counts and nulls but no ordering stats. ``rsd`` is the HLL++ relative
    standard deviation (accuracy/space of the distinct sketch).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    cols = []
    for name, dtype in df.dtypes:
        base = dtype.split("(")[0]
        simple = base in _NUMERIC or base in ("string", "boolean", "date", "timestamp")
        cols.append((name, dtype, base, simple))
        aggs.append(F.count(F.when(F.col(name).isNull(), 1)).alias(f"__null_{name}"))
        if simple:
            aggs.append(
                F.approx_count_distinct(name, rsd=rsd).alias(f"__dist_{name}")
            )
            aggs.append(F.min(name).cast("string").alias(f"__min_{name}"))
            aggs.append(F.max(name).cast("string").alias(f"__max_{name}"))
        if base in _NUMERIC:
            aggs.append(F.avg(name).alias(f"__mean_{name}"))
            aggs.append(F.stddev_pop(name).alias(f"__sd_{name}"))

    row = df.agg(*aggs)
    out = []
    for name, dtype, base, simple in cols:
        numeric = base in _NUMERIC
        out.append(
            F.struct(
                F.lit(name).alias("column"),
                F.lit(dtype).alias("dtype"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{name}").alias("n_nulls"),
                F.when(F.col("__n") > 0, F.col(f"__null_{name}") / F.col("__n"))
                .otherwise(F.lit(0.0))
                .alias("null_frac"),
                (
                    F.col(f"__dist_{name}") if simple else F.lit(None).cast("bigint")
                ).alias("approx_distinct"),
                (
                    F.col(f"__min_{name}") if simple else F.lit(None).cast("string")
                ).alias("min_value"),
                (
                    F.col(f"__max_{name}") if simple else F.lit(None).cast("string")
                ).alias("max_value"),
                (
                    F.col(f"__mean_{name}") if numeric else F.lit(None).cast("double")
                ).alias("mean"),
                (
                    F.col(f"__sd_{name}") if numeric else F.lit(None).cast("double")
                ).alias("stddev"),
            )
        )
    return row.select(F.explode(F.array(*out)).alias("p")).select("p.*")
