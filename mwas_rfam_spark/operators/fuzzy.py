"""Edit-distance fuzzy matching (PassJoin-style segment blocking).

Beyond-parity extension (SURVEY.md §7 M5): the reference has no fuzzy
string matching; a training-data pipeline needs it for near-identical
title/URL/short-field dedup where token-level Jaccard is too coarse
(one-character typos) and embedding similarity is overkill.

Design (Li, Deng, Feng — "PassJoin: a partition-based method for
similarity joins", PVLDB 5(3), 2011 — the published pigeonhole scheme):

* Pigeonhole blocking: split every string into ``d+1`` contiguous
  segments. If ``ed(s, t) <= d``, at least one of ``s``'s segments is
  untouched by all edits, so it appears VERBATIM in ``t`` — shifted by
  at most ``d`` positions (each edit shifts later characters by <= 1).
  Candidates therefore come from an equi-join on
  ``(source_length, segment_slot, substring)`` — an inverted index,
  never an all-pairs product.
* Everything stays in whole-stage codegen: segments and probe
  substrings are built with ``transform``/``sequence``/``substring``
  column expressions, verification is the built-in ``levenshtein``
  (JVM). No Python in the plan.
* Asymmetry kills the double-count: only the SHORTER side emits
  segments and only the longer side emits probe substrings
  (ties broken by id), so each pair is generated once.
* Short strings (length <= d) can be rewritten entirely, so the
  pigeonhole gives no guarantee — they fall back to a length-window
  block (|t| <= 2d): a broadcast join over the tiny length-bounded
  slice, still never a full cross product.

100 TB shape: probe fan-out is O(d^3) rows per string (d+1 source
lengths x d+1 slots x 2d+1 shifts) — constant for the small d this
family is for (1-3); candidate volume is bounded by segment-bucket
collisions exactly like the shingle/LSH families, and the verify step
touches only candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mwas_rfam_spark.operators.dedup import normalize_text


def _seg_struct_sql(k: int, i: str, length: str, shift: str = "0") -> str:
    """SQL struct (src_len, slot, start, seg_len) for slot ``i`` of the
    canonical even split of a length-``length`` string: with
    base = L div k and rem = L mod k, the first k-rem segments have
    ``base`` chars and the last ``rem`` have ``base+1`` — start
    positions are a pure function of (L, slot), which is what lets the
    probe side reconstruct them for any source length. 1-based (SQL
    substring convention). THE single definition of the pigeonhole
    arithmetic — index and both probe variants all expand it."""
    return (
        f"struct({length} AS src_len, {i} AS slot, "
        f"1 + {i} * ({length} div {k}) "
        f"+ greatest(0L, {i} - ({k} - {length} % {k})) + {shift} AS start, "
        f"({length} div {k}) "
        f"+ (CASE WHEN {i} >= {k} - {length} % {k} THEN 1 ELSE 0 END) AS seg_len)"
    )


def _segments_expr(length: str, k: int):
    """Array of segment structs for the indexed side."""
    return F.expr(
        f"transform(sequence(0, {k - 1}), i -> {_seg_struct_sql(k, 'i', length)})"
    )


def _probe_expr(k: int, d: int, length_col: str, hi: str):
    """Array of candidate-substring structs for the probing side: every
    source length in [max(k, len-d), hi], every slot, every shift in
    [-d, d], clipped to the probing string's bounds."""
    return F.expr(
        f"""
        filter(
          flatten(transform(sequence(greatest({k}L, {length_col} - {d}), {hi}), L ->
            flatten(transform(sequence(0, {k - 1}), i ->
              transform(sequence(-{d}, {d}), sh -> {_seg_struct_sql(k, "i", "L", "sh")})
            ))
          )),
          p -> p.start >= 1 AND p.start + p.seg_len - 1 <= {length_col}
        )
        """
    )


def edit_distance_pairs(
    docs: DataFrame,
    max_dist: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """All pairs with ``levenshtein(a, b) <= max_dist`` over a corpus →
    (id_a, id_b, dist), id_a < id_b, each pair once.

    ``normalize=True`` compares the canonical form (lowercase,
    collapsed whitespace — the same :func:`normalize_text` every other
    dedup family keys on); the distance reported is over that form.
    """
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    d = int(max_dist)
    k = d + 1

    txt = normalize_text(F.col(text_col)) if normalize else F.col(text_col)
    base = docs.select(
        F.col(id_col).alias("id"),
        txt.alias("s"),
        F.length(txt).alias("len"),
    ).where(F.col("s").isNotNull())

    long_enough = base.where(F.col("len") >= k)

    # --- index side: one row per (source length, slot, segment) -------
    # ids + join keys ONLY: segments are cut map-side, so neither the
    # candidate exchange nor the pair dedup ever shuffles a full string
    # (long fields would otherwise ride the two widest exchanges twice —
    # r5 verdict task #5); strings re-join AFTER dedup, id-partitioned,
    # each exactly once.
    segs = long_enough.select(
        "id",
        "s",
        F.explode(_segments_expr("len", k)).alias("g"),
    ).select(
        F.col("id").alias("id_s"),
        F.col("g.src_len").alias("src_len"),
        F.col("g.slot").alias("slot"),
        F.substring(F.col("s"), F.col("g.start").cast("int"), F.col("g.seg_len").cast("int")).alias("seg"),
    )

    # --- probe side: substrings matching any source length in ---------
    # [len-d, len] (the shorter side indexes; equal lengths join with an
    # id tiebreak), each slot, each shift in [-d, d]
    probe = long_enough.select(
        "id",
        "s",
        F.col("len").alias("probe_len"),
        F.explode(_probe_expr(k, d, "len", "len")).alias("p"),
    ).select(
        F.col("id").alias("id_t"),
        "probe_len",
        F.col("p.src_len").alias("src_len"),
        F.col("p.slot").alias("slot"),
        F.substring(F.col("s"), F.col("p.start").cast("int"), F.col("p.seg_len").cast("int")).alias("seg"),
    )

    candidates = (
        segs.join(probe, ["src_len", "slot", "seg"])
        .where(
            (F.col("src_len") < F.col("probe_len"))
            | ((F.col("src_len") == F.col("probe_len")) & (F.col("id_s") < F.col("id_t")))
        )
        .select("id_s", "id_t")
        .dropDuplicates(["id_s", "id_t"])
    )

    strs = long_enough.select("id", "s")
    verified = (
        candidates.join(
            strs.select(F.col("id").alias("id_s"), F.col("s").alias("s_s")), "id_s"
        )
        .join(strs.select(F.col("id").alias("id_t"), F.col("s").alias("s_t")), "id_t")
        .select("id_s", "id_t", F.levenshtein("s_s", "s_t").alias("dist"))
        .where(F.col("dist") <= d)
    )

    # --- short-string fallback: |s| <= d gives no pigeonhole ----------
    # guarantee; any match has |t| <= |s| + d <= 2d, so block on the
    # tiny length-bounded slice (broadcast — it is d-bounded, not
    # data-bounded, for any corpus without a mass of near-empty docs)
    shorts = base.where(F.col("len") < k)
    near_short = base.where(F.col("len") <= 2 * d)
    short_pairs = (
        F.broadcast(shorts.select(F.col("id").alias("id_s"), F.col("s").alias("s_s")))
        .join(
            near_short.select(F.col("id").alias("id_t"), F.col("s").alias("s_t")),
            # either orientation: the short string's id can be on either
            # side of the partner's; both-short pairs appear twice and
            # collapse in the dedup below
            F.col("id_s") != F.col("id_t"),
        )
        .select(
            F.least("id_s", "id_t").alias("id_s"),
            F.greatest("id_s", "id_t").alias("id_t"),
            F.levenshtein("s_s", "s_t").alias("dist"),
        )
        .where(F.col("dist") <= d)
        .dropDuplicates(["id_s", "id_t"])
    )

    out = verified.unionByName(short_pairs)
    return out.select(
        F.least("id_s", "id_t").alias("id_a"),
        F.greatest("id_s", "id_t").alias("id_b"),
        "dist",
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    max_dist: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """R-S fuzzy join → (left_id, right_id, dist) with
    ``levenshtein <= max_dist`` — entity-resolution shape (e.g. new
    batch against a canonical reference list). Same PassJoin blocking:
    the RIGHT side indexes segments, the LEFT side probes, and both
    directions of the length inequality are probed so no pair is
    missed; short strings fall back to the d-bounded length window."""
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    d = int(max_dist)
    k = d + 1

    def prep(df: DataFrame, side: str) -> DataFrame:
        txt = normalize_text(F.col(text_col)) if normalize else F.col(text_col)
        return df.select(
            F.col(id_col).alias(f"{side}_id"),
            txt.alias(f"{side}_s"),
            F.length(txt).alias(f"{side}_len"),
        ).where(F.col(f"{side}_s").isNotNull())

    L = prep(left, "left")
    R = prep(right, "right")

    # ids + join keys only through the candidate exchanges (same
    # string-slimming as edit_distance_pairs); strings re-join after
    # the pair dedup, each exactly once
    r_segs = R.where(F.col("right_len") >= k).select(
        "right_id",
        "right_s",
        F.explode(_segments_expr("right_len", k)).alias("g"),
    ).select(
        "right_id",
        F.col("g.src_len").alias("src_len"),
        F.col("g.slot").alias("slot"),
        F.substring(
            F.col("right_s"), F.col("g.start").cast("int"), F.col("g.seg_len").cast("int")
        ).alias("seg"),
    )

    # probe every source length within +-d of the left string — both
    # longer and shorter right strings can match in an R-S join
    l_probe = L.where(F.col("left_len") + d >= k).select(
        "left_id",
        "left_s",
        F.explode(_probe_expr(k, d, "left_len", f"left_len + {d}")).alias("p"),
    ).select(
        "left_id",
        F.col("p.src_len").alias("src_len"),
        F.col("p.slot").alias("slot"),
        F.substring(
            F.col("left_s"), F.col("p.start").cast("int"), F.col("p.seg_len").cast("int")
        ).alias("seg"),
    )

    cand_ids = (
        r_segs.join(l_probe, ["src_len", "slot", "seg"])
        .select("left_id", "right_id")
        .dropDuplicates(["left_id", "right_id"])
    )
    verified = (
        cand_ids.join(L.select("left_id", "left_s"), "left_id")
        .join(R.select("right_id", "right_s"), "right_id")
        .select(
            "left_id", "right_id", F.levenshtein("left_s", "right_s").alias("dist")
        )
        .where(F.col("dist") <= d)
    )

    # short RIGHT strings never index; short LEFT strings may probe but
    # their matches can still be missed when the left itself is fully
    # rewritten — cover both with the d-bounded window on either side
    r_short = R.where(F.col("right_len") < k)
    l_short = L.where(F.col("left_len") < k)
    short_pairs = (
        F.broadcast(r_short).join(L.where(F.col("left_len") <= 2 * d), F.lit(True))
        .unionByName(
            F.broadcast(l_short).join(R.where(F.col("right_len") <= 2 * d), F.lit(True))
        )
        .select("left_id", "right_id", F.levenshtein("left_s", "right_s").alias("dist"))
        .where(F.col("dist") <= d)
        .dropDuplicates(["left_id", "right_id"])
    )

    return (
        verified.unionByName(short_pairs)
        .dropDuplicates(["left_id", "right_id"])
    )
