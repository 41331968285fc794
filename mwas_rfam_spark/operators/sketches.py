"""Count-min sketch — a mergeable frequency summary as a RELATION.

Misra–Gries (`streaming.streaming_heavy_hitters`) answers "which keys
are frequent"; count-min answers "how frequent is THIS key" for any
key, in O(depth × width) state independent of key cardinality, with
the classic one-sided guarantee: est ≥ true, and
est ≤ true + (e/width)·N with probability ≥ 1 − e^(−depth) (Cormode &
Muthukrishnan, J. Algorithms 2005).

Spark-first shape: the sketch is a (depth, bucket, cnt) relation, not
a driver-side array — built by ONE explode + groupBy over the corpus
(map-side combinable), merged by union + re-aggregate (the counters
are linear), probed by a broadcast join on the keys' own buckets.
Two hash derivations (the derivation is part of a sketch's identity,
exactly like width/depth/seed — sketches built under different
derivations must never be merged or cross-probed):

- ``hash="md5"`` (default): depth row d's bucket is the d%4-th
  8-hex-char slice of md5('cms:{seed}:{d//4}:' || key) — one digest
  covers four depth rows, and the whole derivation is plain SQL, so
  the sketch CONTENT replays bit-for-bit in DuckDB (pytest-pinned).
- ``hash="xxhash64"``: the JVM hash, seeded per depth — measured ~6×
  faster at ingest scale (SCALE.md probe N) but JVM-only, no
  cross-engine replay.

Reference scope note: the MWAS reference repo has no sketch layer;
this extends the engine's training-data surface next to HLL
cardinality and Misra–Gries heavy hitters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_cols(key_col, seed: int, depth: int, width: int, hash: str):
    """One bucket Column per depth row. md5 (default): FOUR independent
    32-bit buckets come from ONE digest (8-hex-char slices of the
    32-char output — md5's output bits are independent enough for CM's
    pairwise-independence needs), so a depth-4 sketch pays ONE md5 per
    input row instead of four (measured 4x on the 100x probe); deeper
    sketches chain extra digests with a row tag. The slicing is plain
    SQL, so the sketch stays bit-replayable in DuckDB
    (substr(md5('cms:{seed}:{g}:' || key), 1 + 8*(d%4), 8)).
    xxhash64: the JVM hash (seeded per depth) — several times faster
    again, for sketches that don't need the cross-engine replay."""
    if hash == "xxhash64":
        # xxhash64 is cheap enough to evaluate per depth; the staged
        # column is just the normalized key (the callers' select keeps
        # ONLY staged columns, so the key must ride through by name)
        return [
            F.pmod(
                F.xxhash64(F.col("__cmskey"), F.lit(f"cms:{seed}:{d}")),
                F.lit(width),
            ).cast("int")
            for d in range(depth)
        ], [key_col.alias("__cmskey")]
    if hash != "md5":
        raise ValueError(f"hash must be 'md5' or 'xxhash64', got {hash!r}")
    n_groups = (depth + 3) // 4
    # the digests are returned as SEPARATE named columns and the bucket
    # expressions reference them by NAME: Catalyst does not do common-
    # subexpression elimination inside a generator, so inlining the md5
    # into each of the 4 slices evaluates it 4x (measured: the whole
    # one-digest win disappears) — a prior Project computes it once
    digests = [
        F.md5(
            F.concat_ws(":", F.lit("cms"), F.lit(str(seed)), F.lit(str(g)), key_col)
        ).alias(f"__dig{g}")
        for g in range(n_groups)
    ]
    from mwas_rfam_spark.functions.scalar import hex_prefix_u32

    cols = [
        (hex_prefix_u32(F.col(f"__dig{d // 4}"), d % 4) % width).cast("int")
        for d in range(depth)
    ]
    return cols, digests


def cms_build(
    df: DataFrame,
    key_col: str,
    width: int = 2048,
    depth: int = 4,
    seed: int = 0,
    weight_col: str | None = None,
    hash: str = "md5",
) -> DataFrame:
    """Build the sketch relation (depth, bucket, cnt) over ``df``'s
    keys — one explode (depth struct rows per input row) + one
    map-side-combinable aggregate. NULL keys are excluded (they have
    no identity to count); with ``weight_col``, NULL-WEIGHT rows are
    likewise excluded — explicitly filtered, not silently summed as 0
    by SUM's NULL-skip (r12 review finding: the exclusion existed but
    was an undocumented accident of aggregate semantics). ``weight_col``
    aggregates a weighted frequency instead of row counts: ``cnt`` is
    then DOUBLE (fractional weights sum exactly — a per-row integer
    cast would silently undercount and break the one-sided guarantee),
    LONG otherwise; weights must be non-negative for est ≥ true to hold
    (the classic CM contract). At most depth × width rows come back
    regardless of corpus size."""
    if width < 1 or depth < 1:
        raise ValueError(f"width/depth must be >= 1, got {width}/{depth}")
    k = F.col(key_col).cast("string")
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1).cast("long")
    buckets, digests = _bucket_cols(k, seed, depth, width, hash)
    cond = k.isNotNull()
    if weight_col:
        cond = cond & F.col(weight_col).isNotNull()
    staged = df.where(cond).select(*digests, w.alias("__w"))
    rows = staged.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("depth"), b.alias("bucket"))
                    for d, b in enumerate(buckets)
                ]
            )
        ).alias("db"),
        "__w",
    )
    return (
        rows.select("db.depth", "db.bucket", "__w")
        .groupBy("depth", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the SAME (width, depth, seed, hash
    derivation) — counters are linear, so merge is union + re-aggregate.
    The derivation is part of sketch identity exactly like width/depth/
    seed (r12: it was missing from this list — an md5-built and an
    xxhash64-built sketch merge into plausible-looking garbage; the
    streaming layer's cms_state_sketch/compact_cms_state REFUSE that
    mix, this relation-level API cannot detect it). The result
    estimates the concatenated stream as if built in one pass —
    bit-exactly for the unweighted LONG path (pytest-pinned); weighted
    DOUBLE counters agree up to float summation order. Mismatched
    parameters are undetectable from the relation alone (bucket ids
    overlap), so the caller owns that contract — same as every
    mergeable-sketch API."""
    return (
        a.unionByName(b)
        .groupBy("depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int,
    depth: int,
    seed: int = 0,
    hash: str = "md5",
) -> DataFrame:
    """Point-estimate each key in ``keys`` → (key, est): min over the
    depth rows of the key's own buckets, absent buckets counting 0.
    ``key`` keeps the caller's column TYPE (r12 review finding: it came
    back silently cast to string, breaking typed joins back to the
    probe relation); hashing still normalizes through the same string
    cast the build side applies. The SKETCH side broadcasts (at most
    depth × width rows — the preserved left side of a left join cannot
    be broadcast, so the hint goes on the build side); this join never
    touches the original corpus."""
    # same guard as cms_build (r12 review finding: asymmetric — a
    # depth=0 lookup silently returned an EMPTY relation, width=0 threw
    # DIVIDE_BY_ZERO mid-job under ANSI)
    if width < 1 or depth < 1:
        raise ValueError(f"width/depth must be >= 1, got {width}/{depth}")
    k = F.col(key_col)
    probes = keys.where(k.isNotNull()).select(k.alias("key")).distinct()
    buckets, digests = _bucket_cols(F.col("key").cast("string"), seed, depth, width, hash)
    probe_rows = probes.select("key", *digests).select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(d).alias("depth"), b.alias("bucket"))
                    for d, b in enumerate(buckets)
                ]
            )
        ).alias("db"),
    ).select("key", "db.depth", "db.bucket")
    joined = probe_rows.join(F.broadcast(sketch), ["depth", "bucket"], "left")
    return (
        joined.groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
