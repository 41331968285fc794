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
    token_count_col: str | None = None,
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

    ``token_count_col`` packs by a PRECOMPUTED per-doc token count —
    e.g. ``tokenize.bpe_encode(..., emit_tokens=False)``'s real BPE
    ``n_tokens`` — instead of the whitespace proxy on ``text_col``
    (which is then never read).
    """
    # bucket from the first two md5 hex digits (256 values, uniform when
    # n_buckets divides 256) — cross-engine reproducible, unlike xxhash64
    hexv = "0123456789abcdef"
    h = F.md5(F.col(id_col).cast("string"))
    d1 = F.instr(F.lit(hexv), F.substring(h, 1, 1)) - 1
    d2 = F.instr(F.lit(hexv), F.substring(h, 2, 1)) - 1
    counts = (
        F.col(token_count_col).cast("long")
        if token_count_col is not None
        else token_count(F.col(text_col))
    )
    base = docs.select(
        F.col(id_col),
        counts.alias("n_tokens"),
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


def chunk_documents(
    docs: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split long documents into token-window chunks — the complement of
    :func:`pack_documents` (that concatenates short docs; this slices
    long ones for a fixed context window).

    Output (id, chunk_id, chunk_text, n_tokens): chunk windows start
    every ``max_tokens - overlap`` tokens, each carrying up to
    ``max_tokens`` whitespace tokens; the final window may be short, and
    a doc at or under ``max_tokens`` yields exactly one chunk (chunk 0).
    Empty/whitespace-only docs yield no chunks. Tokens re-join with a
    single space (inter-token whitespace is not preserved — the same
    normalization every other token operator here applies).

    Pure column expressions: one split, one sequence/transform over
    window starts, one posexplode — no shuffle at all; the plan is a
    Generate over a projection and scales with total token count.
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"overlap must be in [0, max_tokens), got {overlap}")
    step = max_tokens - overlap
    toked = docs.select(
        F.col(id_col),
        F.when(
            F.length(F.trim(F.col(text_col))) == 0, F.array().cast("array<string>")
        ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+")).alias("__toks"),
    )
    n = F.size("__toks")
    # window starts: 0, step, 2*step, ... while start < n (at least one
    # window for any non-empty doc); sequence is inclusive so cap at n-1
    starts = F.when(n > 0, F.sequence(F.lit(0), (n - 1) - ((n - 1) % step), F.lit(step)))
    chunks = toked.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                starts,
                lambda s: F.slice(F.col("__toks"), s + 1, max_tokens),
            )
        ).alias("chunk_id", "__chunk"),
    )
    # drop overlap-only tails: a window wholly contained in the previous
    # one adds no new tokens (happens when the last start lands inside
    # the previous window's overlap region)
    return (
        chunks.where((F.col("chunk_id") == 0) | (F.size("__chunk") > overlap))
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.concat_ws(" ", F.col("__chunk")).alias("chunk_text"),
            F.size("__chunk").cast("long").alias("n_tokens"),
        )
    )
