"""Sequence packing for training-data pipelines: assign documents to
fixed-token-budget packs.

The classic formulation (greedy first-fit over a global order) is
inherently sequential; the scalable relational form packs WITHIN hash
buckets — documents are spread over ``n_buckets`` by id hash, each bucket
packs independently with a running token cumsum (one window per bucket),
and packs never span buckets. With per-bucket doc counts ~uniform, the
wasted tail per bucket is bounded by one max-length document — at corpus
scale (buckets ≫ executors) this is embarrassingly parallel where the
greedy algorithm is a single thread.

Deterministic end to end (hash order inside buckets), so the whole
assignment is reproducible in ANSI SQL and cross-engine checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count


def pack_documents(
    docs: DataFrame,
    max_tokens_per_pack: int,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, bucket, pack_id) — pack_id is unique across
    buckets (bucket * 2^32 + pack ordinal within the bucket).

    Semantics are CONCAT-THEN-CHUNK (the standard pretraining packing),
    not bin packing: each bucket's documents are concatenated in hash
    order and the token stream is chunked at exact ``max_tokens_per_pack``
    boundaries; a document whose tokens straddle a boundary is split
    across chunks in the physical stream, and ``pack_id`` is the chunk
    holding its LAST token. Every emitted chunk except each bucket's
    final one is exactly full — no padding waste, which is why training
    pipelines prefer this over first-fit (inherently sequential and
    pad-lossy).
    """
    # bucket from the first two md5 hex digits (256 values, uniform when
    # n_buckets divides 256) — cross-engine reproducible, unlike xxhash64
    hexv = "0123456789abcdef"
    h = F.md5(F.col(id_col).cast("string"))
    d1 = F.instr(F.lit(hexv), F.substring(h, 1, 1)) - 1
    d2 = F.instr(F.lit(hexv), F.substring(h, 2, 1)) - 1
    base = docs.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tokens"),
        F.pmod(d1 * 16 + d2, F.lit(n_buckets)).cast("long").alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    # greatest(..., 1): a zero-token doc sorting first in its bucket has
    # cum 0 → ceil 0, which would mint a phantom pack 0 below ordinal 1
    packed = base.withColumn("cum_tokens", F.sum("n_tokens").over(w)).withColumn(
        "pack_in_bucket",
        F.greatest(
            F.ceil((F.col("cum_tokens")) / F.lit(max_tokens_per_pack)).cast("long"),
            F.lit(1).cast("long"),
        ),
    )
    return packed.select(
        id_col,
        "n_tokens",
        "bucket",
        (F.col("bucket") * F.lit(1 << 32) + F.col("pack_in_bucket")).alias("pack_id"),
    )
