"""Multi-column clustering layout (Z-order / Morton curve).

Sorting a table by one column gives parquet row-group min/max pruning on
that column only; point/range filters on a second column still read
every row group. Interleaving the bits of several columns into one
Morton key and range-sorting by it clusters rows so that EVERY keyed
column's values are locally contained per row group — the standard
space-filling-curve layout for multi-dimensional scan locality.

All pure column expressions (shifts/masks, whole-stage codegen); the
only driver-side values are each column's min/max for normalization,
which the caller supplies or lets :func:`zorder_write` compute in one
tiny aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    cols: list[Column | str],
    ranges: list[tuple[float, float]],
    bits: int = 16,
) -> Column:
    """Morton-interleave ``cols`` into one sortable BIGINT.

    Each column is normalized to [0, 2^bits) with its (min, max) from
    ``ranges`` (degenerate ranges map to 0), then bit i of column c lands
    at position i*len(cols)+c of the key. len(cols)*bits must fit a
    signed 64-bit long (<= 62 keeps the sign bit clear).
    """
    n = len(cols)
    if not n or len(ranges) != n:
        raise ValueError("cols and ranges must be non-empty and aligned")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit key")
    quantized = []
    top = (1 << bits) - 1
    for c, (lo, hi) in zip(cols, ranges):
        col = F.col(c) if isinstance(c, str) else c
        span = float(hi) - float(lo)
        if span <= 0:
            quantized.append(F.lit(0).cast("long"))
            continue
        q = F.floor(
            (col.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(float(top))
        ).cast("long")
        quantized.append(F.least(F.greatest(q, F.lit(0)), F.lit(top)))
    key = F.lit(0).cast("long")
    for i in range(bits):
        for c_idx, q in enumerate(quantized):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, i * n + c_idx)
    return key


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` parquet clustered by the Z-order of ``cols``:
    range-partition on the Morton key (one shuffle), sort within each
    file, drop the key. Filters on ANY keyed column then prune row
    groups by their min/max stats — verified against the actual parquet
    footers in tests."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    for c in cols:
        if stats[f"lo_{c}"] is None or stats[f"hi_{c}"] is None:
            # all-NULL (or empty) keyed column: float(None) below would
            # surface as a bare TypeError far from the cause
            raise ValueError(
                f"zorder_write: column {c!r} has no non-NULL values to range on"
            )
    ranges = [(stats[f"lo_{c}"], stats[f"hi_{c}"]) for c in cols]
    keyed = df.withColumn("_zkey", zorder_key(list(cols), ranges, bits))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
