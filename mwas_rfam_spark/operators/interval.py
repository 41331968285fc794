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
    # same loud integral-timeline check as asof_join (r12 review
    # finding: a double ts died deep in analysis with a cryptic
    # DATATYPE_MISMATCH from `ts div tol`)
    _require_integral_ts(a, ts_col, "left", "interval_join_within")
    _require_integral_ts(b, ts_col, "right", "interval_join_within")
    sa, sb = suffixes
    # fail-loud on name collisions (r13 review finding): with an empty
    # suffix (pandas-style ("", "_b")) a caller column named `bucket` or
    # `b0` was silently OVERWRITTEN by the internal bucketing columns
    # and then dropped from the output, and an `abs_delta` input was
    # silently replaced by the computed delta — against this module's
    # loud-contract convention.
    internal = {"bucket", "b0", "abs_delta"}
    suffixed = {c + sa for c in a.columns} | {c + sb for c in b.columns}
    clashes = sorted(internal & suffixed)
    if clashes:
        raise ValueError(
            f"interval_join_within: suffixed input column(s) {clashes} "
            "collide with internal/output names ('bucket', 'b0' are "
            "internal; 'abs_delta' is the output delta) — rename the "
            "columns or use non-empty suffixes"
        )

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


_INTEGRAL_TS = ("tinyint", "smallint", "int", "bigint")


def _require_integral_ts(frame, ts_col: str, side: str, fn: str) -> None:
    dt = dict(frame.dtypes).get(ts_col)
    if dt is None:
        raise ValueError(f"{fn}: {side} input has no column {ts_col!r}")
    if dt not in _INTEGRAL_TS:
        raise ValueError(
            f"{fn}: {side}.{ts_col} must be an integral timeline "
            f"(e.g. epoch nanos as BIGINT — see ensure_epoch_nanos), got {dt}"
        )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by=None,
    direction: str = "backward",
    tolerance: int | None = None,
    right_cols=None,
    suffix: str = "_r",
) -> DataFrame:
    """As-of join (pandas merge_asof / DuckDB ASOF JOIN semantics): attach
    to each left row the single right row with the greatest right.ts <=
    left.ts (``backward``; inclusive) or smallest right.ts >= left.ts
    (``forward``), per ``by`` group, optionally within ``tolerance``
    timeline units. Unmatched left rows keep nulls (left-join semantics).

    Spark-first formulation — NO range join and no per-row lookup: tag
    and UNION both inputs on (by, ts), then one running
    ``last(value, ignorenulls=True)`` window per right payload column
    carries the most recent right row forward to every left row. One
    shuffle (hash on ``by``), one sort — the same cost class as any
    windowed aggregation, and skew-safe when ``by`` keys are balanced.
    With no ``by`` the window is a single global sort partition — correct
    but serial; pass a key at scale (the same caveat as any global
    window).

    Ties: right rows sort before left rows at equal ts (inclusive
    match); among multiple right rows at the SAME (by, ts) the winner
    follows the sort's final tiebreak and is engine-dependent — give the
    right side unique (by, ts) keys (dedup first) for determinism.

    ``tolerance`` (same unit as the timeline, e.g. nanos) null-outs
    matches farther than the bound instead of dropping the left row.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction}")
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")
    # the timeline must be integral: the sort keys negate via `ts * sign`
    # (a timestamp type fails outright there) and the tolerance check
    # subtracts two keys cast to long (a double timeline would silently
    # truncate sub-integer deltas). Fail loud instead of either.
    _require_integral_ts(left, ts_col, "left", "asof_join")
    _require_integral_ts(right, ts_col, "right", "asof_join")
    by = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != ts_col and c not in by]
    else:
        missing = [c for c in right_cols if c not in right.columns]
        if missing:
            # was a bare KeyError with no context (r12 review finding)
            raise ValueError(
                f"asof_join: right_cols {missing} not in the right "
                f"frame's columns {right.columns}"
            )
        # ts_r is emitted automatically; including ts_col here used to
        # crash with COLUMN_ALREADY_EXISTS (r12 review finding)
        right_cols = [c for c in right_cols if c != ts_col]
    # a NULL-ts right row is unordered on the timeline and must never
    # supply a match (r12 review finding: its payload leaked through
    # the per-column carry)
    right = right.where(F.col(ts_col).isNotNull())
    sign = F.lit(1) if direction == "backward" else F.lit(-1)

    rtypes = {f.name: f.dataType for f in right.schema.fields}
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    lcols = list(left.columns)

    # ONE struct per right row, carried atomically: per-column
    # last(ignorenulls=True) skipped genuine NULLs in the matched row's
    # payload and backfilled each column independently from OLDER right
    # rows — values torn from different rows (and outside tolerance)
    # in one output row (r12 review finding, execution-confirmed; the
    # DuckDB-ASOF/merge_asof semantics this module pins return the
    # matched row's own NULL). The struct is non-null for every right
    # row, so the carry picks the nearest right ROW whole.
    # __ts is NOT carried: the matched right ts is recoverable from the
    # sort key (__rsk = ts * sign, sign² = 1, timeline guarded integral),
    # so the window buffer copies one long less per row — the struct
    # carry's cost is per-field (probe r13a measured it ~+22% over the
    # torn per-column shape at one payload column, flat with width)
    def _r_struct_fields(src: bool):
        f_sk = (
            (F.col(ts_col) * sign).cast("long")
            if src
            else F.lit(None).cast("long")
        ).alias("__rsk")
        pay = [
            (F.col(c) if src else F.lit(None).cast(rtypes[c])).alias(c)
            for c in right_cols
        ]
        return [f_sk, *pay]

    l_side = left.select(
        *[F.col(c) for c in lcols],
        # when(False, ...) -> a typed NULL struct (a struct OF nulls is
        # itself non-null and would be carried)
        F.when(F.lit(False), F.struct(*_r_struct_fields(False))).alias("__r_row"),
        (F.col(ts_col) * sign).cast("long").alias("__sk"),
        F.lit(1).alias("__tag"),
    )
    r_side = right.select(
        *[
            F.col(c).alias(c) if c in by else F.lit(None).cast(ltypes[c]).alias(c)
            for c in lcols
        ],
        F.struct(*_r_struct_fields(True)).alias("__r_row"),
        (F.col(ts_col) * sign).cast("long").alias("__sk"),
        F.lit(0).alias("__tag"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__sk"), F.col("__tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_side.unionByName(r_side).select(
        *lcols,
        "__tag",
        "__sk",
        F.last("__r_row", ignorenulls=True).over(w).alias("__m_row"),
    )
    out = carried.where(F.col("__tag") == 1)
    in_range = F.col("__m_row").isNotNull()
    if tolerance is not None:
        in_range = in_range & (
            (F.col("__sk") - F.col("__m_row.__rsk")) <= tolerance
        )
    return out.select(
        *lcols,
        *[
            F.when(in_range, F.col(f"__m_row.{c}")).alias(f"{c}{suffix}")
            for c in right_cols
        ],
        F.when(
            in_range, (F.col("__m_row.__rsk") * sign).cast(rtypes[ts_col])
        ).alias(f"{ts_col}{suffix}"),
    )


def sessionize(
    events: DataFrame,
    gap: int,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based batch sessionization: events of one key belong to the
    same session while consecutive gaps stay <= ``gap`` (same unit as
    the numeric ``ts_col`` timeline; the streaming analog is
    `streaming.requests`' session window). Adds:

      - ``session_seq``   0-based session index within the key
      - ``session_id``    globally unique (key, seq) composite string

    Classic lag/flag/cumsum over ONE per-key window — a single shuffle
    on the key, no join, no iteration. Per-key event mass lands in one
    partition task (the window sort); a key with pathological event
    counts is real hot-entity skew — range-partition on (key, coarse
    time) upstream if a single entity exceeds a task.
    """
    from pyspark.sql import Window

    if gap <= 0:
        raise ValueError(f"gap must be positive, got {gap}")
    w = Window.partitionBy(key_col).orderBy(ts_col)
    new_flag = (
        F.when(
            F.col(ts_col) - F.lag(ts_col).over(w) > F.lit(gap), F.lit(1)
        ).otherwise(F.lit(0))
    )
    return (
        events.withColumn("session_seq", F.sum(new_flag).over(w))
        .withColumn(
            "session_id",
            F.concat_ws("-", F.col(key_col).cast("string"), F.col("session_seq")),
        )
    )


def session_summaries(
    events: DataFrame,
    gap: int,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """One row per session: (key, session_seq, start/end ts, n_events,
    duration). The groupBy reuses sessionize's key partitioning — with
    the window's shuffle already keyed by ``key_col``, the aggregation
    is map-side within the same partitions (no second wide exchange of
    the full event set)."""
    s = sessionize(events, gap, ts_col, key_col)
    return s.groupBy(key_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration"),
    )
