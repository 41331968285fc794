"""Data-quality validation tests: report counts computed by hand,
null semantics (NULL rule result = violation; NULL is a value for
uniqueness), quarantine reasons, FK orphans, healthy-corpus fast path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mwas_rfam_spark.operators.validation import (
    in_range,
    matches_regex,
    not_null,
    quarantine,
    satisfies,
    validate,
)


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "en", 10.0),
            (2, "en", -3.0),     # range violation
            (3, None, 5.0),      # null lang
            (3, "fr", 7.0),      # duplicate id
            (5, "de", None),     # null score -> range rule violated too
            (6, "zz9", 1.0),     # regex violation
        ],
        ["doc_id", "lang", "score"],
    )


def RULES():
    # built lazily: Column construction needs an active session
    return [
        not_null("lang"),
        in_range("score", 0.0, 100.0),
        matches_regex("lang", r"^[a-z]{2}$"),
    ]


def test_report_counts(spark, corpus):
    ref = spark.createDataFrame([(1,), (2,), (3,), (6,)], ["id"])
    r = validate(
        corpus,
        RULES(),
        unique=[["doc_id"]],
        foreign_keys=[("doc_id", ref, "id")],
    ).collect()[0]
    assert r["n_rows"] == 6
    assert r["viol:not_null(lang)"] == 1
    assert r["viol:in_range(score,0.0,100.0)"] == 2  # -3 and NULL
    assert r["viol:matches_regex(lang)"] == 2  # NULL and 'zz9'
    assert r["viol:unique(doc_id)"] == 1  # id 3 twice
    assert r["viol:fk(doc_id)"] == 1  # id 5 has no reference row
    assert r["ok"] is False


def test_healthy_corpus_ok(spark):
    df = spark.createDataFrame([(1, "en", 1.0), (2, "fr", 2.0)], ["doc_id", "lang", "score"])
    r = validate(df, RULES(), unique=[["doc_id"]]).collect()[0]
    assert r["ok"] is True
    assert all(v == 0 for k, v in r.asDict().items() if k.startswith("viol:"))


def test_quarantine_reasons(spark, corpus):
    ref = spark.createDataFrame([(1,), (2,), (3,), (6,)], ["id"])
    q = quarantine(
        corpus,
        RULES(),
        unique=[["doc_id"]],
        foreign_keys=[("doc_id", ref, "id")],
    )
    rows = {(r["doc_id"], r["lang"]): set(r["violations"]) for r in q.collect()}
    assert rows[(2, "en")] == {"in_range(score,0.0,100.0)"}
    assert rows[(3, None)] == {"not_null(lang)", "matches_regex(lang)"}
    # the second row of the duplicate id-3 group is the unique violator
    assert "unique(doc_id)" in rows[(3, "fr")]
    assert rows[(5, "de")] == {"in_range(score,0.0,100.0)", "fk(doc_id)"}
    assert rows[(6, "zz9")] == {"matches_regex(lang)"}
    assert (1, "en") not in rows  # clean row absent


def test_custom_rule_and_null_is_violation(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 20)], "id LONG, v INT"
    )
    r = validate(df, [satisfies("v_lt_10", F.col("v") < 10)]).collect()[0]
    # v=NULL evaluates the predicate to NULL -> violation, same as 20
    assert r["viol:v_lt_10"] == 2


def test_unique_treats_null_as_value(spark):
    df = spark.createDataFrame(
        [(None, "a"), (None, "b"), (1, "c")], "k INT, x STRING"
    )
    r = validate(df, unique=[["k"]]).collect()[0]
    assert r["viol:unique(k)"] == 1  # two NULL keys = one duplicate
    q = quarantine(df, unique=[["k"]])
    assert q.count() == 1


def test_empty_batch_reports_ok(spark):
    """A healthy-but-empty batch must report zero violations and
    ok=True — SUM over zero rows is NULL without the coalesce, and a
    NULL ok would park every empty batch at a falsy gate."""
    df = spark.createDataFrame([], "doc_id LONG, lang STRING, score DOUBLE")
    ref = spark.createDataFrame([(1,)], ["id"])
    r = validate(
        df, RULES(), unique=[["doc_id"]], foreign_keys=[("doc_id", ref, "id")]
    ).collect()[0]
    assert r["n_rows"] == 0 and r["ok"] is True
    assert all(v == 0 for k, v in r.asDict().items() if k.startswith("viol:"))


def test_quarantine_with_map_column(spark):
    """A non-orderable (map) metadata column must not break the
    uniqueness window's keep-first ordering."""
    df = spark.createDataFrame(
        [(1, {"k": "v"}), (1, {"k": "w"}), (2, {"k": "x"})],
        "doc_id LONG, meta MAP<STRING,STRING>",
    )
    q = quarantine(df, unique=[["doc_id"]])
    assert q.count() == 1
    assert q.collect()[0]["doc_id"] == 1


def test_two_fks_on_same_column(spark):
    """Two references for one column must produce two distinct report
    labels (duplicate agg aliases made the ok-reduction throw
    AMBIGUOUS_REFERENCE)."""
    df = spark.createDataFrame([(1,), (2,), (9,)], ["doc_id"])
    ref_a = spark.createDataFrame([(1,), (2,)], ["id"])
    ref_b = spark.createDataFrame([(1,), (9,)], ["id"])
    r = validate(
        df, foreign_keys=[("doc_id", ref_a, "id"), ("doc_id", ref_b, "id")]
    ).collect()[0]
    viols = {k: v for k, v in r.asDict().items() if k.startswith("viol:fk")}
    assert sorted(viols.values()) == [1, 1]  # 9 orphan in a, 2 orphan in b
    assert len(viols) == 2 and r["ok"] is False


def test_quarantine_nested_map_and_all_map(spark):
    """Maps nested in arrays/structs are non-orderable too, and a frame
    whose every non-key column is map-typed still quarantines."""
    df = spark.createDataFrame(
        [(1, [{"k": "v"}]), (1, [{"k": "w"}]), (2, [{"k": "x"}])],
        "doc_id LONG, metas ARRAY<MAP<STRING,STRING>>",
    )
    assert quarantine(df, unique=[["doc_id"]]).count() == 1
    only_maps = spark.createDataFrame(
        [({"a": "1"},), ({"a": "1"},)], "m MAP<STRING,STRING>"
    )
    q = quarantine(only_maps, unique=[["m"]])
    assert q.count() == 1  # duplicate map key, ordered via to_json fallback


def test_duplicate_labels_disambiguated(spark):
    """Copy-pasted rules / duplicate unique sets must yield distinct
    report columns, not an AMBIGUOUS_REFERENCE crash (reachable from a
    hand-edited rules.json via the CLI)."""
    df = spark.createDataFrame([(1, None), (2, "en")], ["doc_id", "lang"])
    r = validate(
        df,
        [not_null("lang"), not_null("lang")],
        unique=[["doc_id"], ["doc_id"]],
    ).collect()[0]
    viols = {k: v for k, v in r.asDict().items() if k.startswith("viol:")}
    assert len(viols) == 4 and r["ok"] is False
    assert sorted(viols.values()) == [0, 0, 1, 1]
    q = quarantine(df, [not_null("lang"), not_null("lang")])
    reasons = set(q.collect()[0]["violations"])
    assert reasons == {"not_null(lang)#0", "not_null(lang)#1"}
