"""Declarative data-quality validation — the Deequ-shaped (Schelter et
al., VLDB 2018) expectations gate every long-lived ingest pipeline puts
in front of its corpus.

Extension surface: the reference validates its input once, imperatively
(arity/dtype checks at mwas_general.py:752-759, size gates in
converter_.py:38-41); a continuously-ingesting 100 TB pipeline needs the
declarative form — a rule set evaluated in ONE aggregation pass with a
machine-checkable report, plus a quarantine relation for the rows that
fail, so bad batches park instead of poisoning the corpus.

Three rule flavors, costed differently on purpose:

* **row-local** rules (not_null / in_range / matches_regex / custom
  expression) evaluate as boolean columns — the whole report is one
  map-side-combined aggregation, no shuffle beyond the final 1-row
  reduce, whatever the rule count;
* **uniqueness** is relational: violations = rows − distinct(keys),
  counted in the same pass via count_distinct, with the offending rows
  recovered only by the quarantine path (groupBy + semi-join);
* **referential integrity** anti-joins a (broadcast) reference relation.

`validate` returns the one-row report; `quarantine` returns the failing
rows with a `violations` array naming every rule each row breaks —
append it to a dead-letter table and re-drive after fixes (the
maintenance-sink upsert is the re-entry path).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named row-local expectation: ``passes`` must be a boolean
    Column that is True when the row SATISFIES the rule. NULL results
    count as violations (unknown is not a pass)."""

    name: str
    passes: Column


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        f"in_range({col},{lo},{hi})",
        F.col(col).isNotNull() & (F.col(col) >= lo) & (F.col(col) <= hi),
    )


def matches_regex(col: str, pattern: str) -> Rule:
    return Rule(
        f"matches_regex({col})",
        F.col(col).isNotNull() & F.col(col).rlike(pattern),
    )


def satisfies(name: str, expr: Column) -> Rule:
    """Escape hatch: any boolean expression as a named rule."""
    return Rule(name, expr)


def _fails(rule: Rule) -> Column:
    # NULL-safe: a rule evaluating to NULL is a violation
    return F.when(F.coalesce(rule.passes, F.lit(False)), 0).otherwise(1)


def _fk_labels(foreign_keys) -> list[str]:
    """One label per constraint, disambiguated when the same column is
    checked against several references (duplicate agg aliases would
    otherwise make the report's ok-reduction throw
    AMBIGUOUS_REFERENCE)."""
    from collections import Counter

    counts = Counter(col for col, _, _ in foreign_keys)
    seen: Counter = Counter()
    labels = []
    for col, _, ref_col in foreign_keys:
        if counts[col] > 1:
            labels.append(f"fk({col}->{ref_col}#{seen[col]})")
            seen[col] += 1
        else:
            labels.append(f"fk({col})")
    return labels


def _attach_fk_flag(df: DataFrame, col: str, ref: DataFrame, ref_col: str, flag: str, key: str) -> DataFrame:
    """Broadcast membership flag: ``flag`` is True where ``col`` exists
    in the reference — ONE definition shared by the report and the
    quarantine path so their orphan semantics cannot drift."""
    keys = ref.select(F.col(ref_col).alias(key)).distinct()
    return df.join(
        F.broadcast(keys.withColumn(flag, F.lit(True))),
        df[col] == keys[key],
        "left",
    ).drop(key)


def _orderable_type(dt) -> bool:
    """Mirror of Spark's RowOrdering.isOrderable: maps, variants, and
    calendar intervals are non-orderable ANYWHERE in the type
    (top-level, array element, struct field)."""
    from pyspark.sql.types import ArrayType, StructType

    if type(dt).__name__ in (
        "MapType",
        "VariantType",
        "CalendarIntervalType",
    ):
        return False
    if isinstance(dt, ArrayType):
        return _orderable_type(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable_type(f.dataType) for f in dt.fields)
    return True


def _dedupe_labels(labels: list[str]) -> list[str]:
    """Append '#k' to repeated labels so agg aliases (and the matching
    quarantine reasons) stay unique — duplicate rule names, unique key
    sets, or FK targets would otherwise make the report's ok-reduction
    throw AMBIGUOUS_REFERENCE (reachable from a hand-edited rules.json
    with a copy-pasted entry)."""
    from collections import Counter

    counts = Counter(labels)
    seen: Counter = Counter()
    out = []
    for lab in labels:
        if counts[lab] > 1:
            out.append(f"{lab}#{seen[lab]}")
            seen[lab] += 1
        else:
            out.append(lab)
    return out


def validate(
    df: DataFrame,
    rules: list[Rule] | None = None,
    unique: list[list[str]] | None = None,
    foreign_keys: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """One-row report: ``n_rows``, one ``viol:<rule>`` count per rule,
    ``viol:unique(...)`` per key set (rows beyond the first of each
    duplicate group), ``viol:fk(...)`` per reference — and ``ok``
    (True iff every count is 0).

    Cost model: all row-local rules + uniqueness counts + foreign-key
    orphan counts ride ONE lazy aggregation over the input — each FK
    attaches a broadcast-left-join membership flag BEFORE the agg, so
    the whole report is a single plan evaluated at collect time
    (build-time eager FK jobs would also snapshot a different dataset
    state than the collect-time row-local counts). An empty input
    reports zero violations and ok=True (sums coalesce — SUM over zero
    rows is NULL, which would make ``ok`` NULL and fail falsy gates on
    every healthy-but-empty batch). Nothing is collected but the report
    row itself.
    """
    rules = rules or []
    unique = unique or []
    foreign_keys = foreign_keys or []
    # ONE deduplicated label list across every constraint kind — any
    # repeated label (copy-pasted rule, duplicate unique set, same FK
    # twice) would otherwise collide as agg aliases
    all_labels = _dedupe_labels(
        [r.name for r in rules]
        + [f"unique({','.join(cols)})" for cols in unique]
        + _fk_labels(foreign_keys)
    )
    rule_labels = all_labels[: len(rules)]
    uniq_labels = all_labels[len(rules) : len(rules) + len(unique)]
    fk_labels = all_labels[len(rules) + len(unique) :]
    work = df
    fk_flags: list[tuple[str, str, str]] = []
    for i, (col, ref, ref_col) in enumerate(foreign_keys):
        flag = f"__fk_ok_{i}"
        work = _attach_fk_flag(work, col, ref, ref_col, flag, f"__fkk_{i}")
        fk_flags.append((col, flag, fk_labels[i]))
    aggs = [F.count("*").alias("n_rows")]
    for r, lab in zip(rules, rule_labels):
        aggs.append(
            F.coalesce(F.sum(_fails(r)), F.lit(0)).alias(f"viol:{lab}")
        )
    for cols, lab in zip(unique, uniq_labels):
        # NULL-safe distinct: count(DISTINCT a, b) drops any row with a
        # null key, which would miscount every null-keyed row as a
        # duplicate — the sentinel coalesce treats NULL as a value,
        # matching the quarantine path's grouping
        keys = [
            F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in cols
        ]
        aggs.append(
            (F.count("*") - F.count_distinct(*keys)).alias(f"viol:{lab}")
        )
    for col, flag, label in fk_flags:
        aggs.append(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col(col).isNotNull() & F.col(flag).isNull(), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias(f"viol:{label}")
        )
    report = work.agg(*aggs)
    viol_cols = [c for c in report.columns if c.startswith("viol:")]
    ok = F.lit(True)
    for c in viol_cols:
        # rule names contain dots (range bounds) — backtick-quote so
        # F.col doesn't parse them as struct field access
        ok = ok & (F.col(f"`{c}`") <= 0)
    return report.withColumn("ok", ok)


def quarantine(
    df: DataFrame,
    rules: list[Rule] | None = None,
    unique: list[list[str]] | None = None,
    foreign_keys: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """The failing rows, each with a ``violations`` array naming every
    rule it breaks (row-local rules as expressions; uniqueness marks
    every row PAST THE FIRST of a duplicate group, "first" = smallest
    by the orderable columns, keys leading; orphan foreign keys via
    broadcast anti-membership). Rows violating nothing are absent — at
    a healthy steady state this relation is empty and costs one
    filter."""
    from pyspark.sql import Window

    rules = rules or []
    unique = unique or []
    foreign_keys = foreign_keys or []
    # same deduplicated labels as validate's report columns
    all_labels = _dedupe_labels(
        [r.name for r in rules]
        + [f"unique({','.join(cols)})" for cols in unique]
        + _fk_labels(foreign_keys)
    )
    rule_labels = all_labels[: len(rules)]
    uniq_labels = all_labels[len(rules) : len(rules) + len(unique)]
    fk_labels = all_labels[len(rules) + len(unique) :]
    out = df
    tags = []
    for r, lab in zip(rules, rule_labels):
        tag = f"__v_{len(tags)}"
        out = out.withColumn(
            tag, F.when(_fails(r) == 1, F.lit(lab))
        )
        tags.append(tag)
    # keep-first needs a deterministic within-group order; only
    # orderable column types participate (a map anywhere in the type —
    # top level, array element, struct field — would throw), keys first
    # so ties break on the remaining columns. Non-orderable columns
    # still contribute determinism via their to_json rendering, which
    # also guards the all-map corner where nothing else is orderable.
    orderable = [
        f.name for f in df.schema.fields if _orderable_type(f.dataType)
    ]
    non_orderable = [f.name for f in df.schema.fields if f.name not in orderable]
    for cols, uq_lab in zip(unique, uniq_labels):
        tag = f"__v_{len(tags)}"
        order_cols = (
            [F.col(c) for c in cols if c in orderable]
            + [F.col(c) for c in orderable if c not in cols]
            + (
                [F.to_json(F.struct(*[F.col(c) for c in non_orderable]))]
                if non_orderable
                else []
            )
        )
        w = Window.partitionBy(*[F.coalesce(F.col(c).cast("string"), F.lit("\0"))
                                 for c in cols]).orderBy(*order_cols)
        out = out.withColumn(
            tag,
            F.when(
                F.row_number().over(w) > 1,
                F.lit(uq_lab),
            ),
        )
        tags.append(tag)
    for i, (col, ref, ref_col) in enumerate(foreign_keys):
        tag = f"__v_{len(tags)}"
        flag = f"__present_{i}"
        out = _attach_fk_flag(out, col, ref, ref_col, flag, f"__qk_{i}").withColumn(
            tag,
            F.when(
                F.col(col).isNotNull() & F.col(flag).isNull(),
                F.lit(fk_labels[i]),
            ),
        ).drop(flag)
        tags.append(tag)
    viol = F.filter(F.array(*[F.col(t) for t in tags]), lambda x: x.isNotNull())
    return (
        out.withColumn("violations", viol)
        .where(F.size("violations") > 0)
        .drop(*tags)
    )
