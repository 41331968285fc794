"""Config-flag semantics: blacklist (P10), t_test_only (T3),
explicit-zeros mode, already_normalized — each a reference CLI flag."""

import pytest
from pyspark.sql import functions as F

from mwas_rfam_spark.config import MwasConfig
from mwas_rfam_spark.operators.condense import condense_metadata
from mwas_rfam_spark.operators.mwas import resolve_and_normalize, run_mwas
from mwas_rfam_spark.schemas import CATALOG_SCHEMA, INPUT_SCHEMA
from mwas_rfam_spark.sources.readers import melt_wide_metadata


@pytest.fixture(scope="module")
def fixture(spark):
    input_df = spark.createDataFrame(
        [(f"R{i}", "g1", float(10 * i)) for i in range(1, 10)], INPUT_SCHEMA
    )
    catalog_df = spark.createDataFrame(
        [("P1" if i <= 6 else "P2", f"SAM0{i}", f"R{i}", 1_000_000) for i in range(1, 10)],
        CATALOG_SCHEMA,
    )
    wide = spark.createDataFrame(
        [(f"SAM0{i}", "a" if i <= 3 else "b", "x" if i % 2 else "y") for i in range(1, 7)],
        ["biosample_id", "t1", "t2"],
    )
    sets_df, ref_df = condense_metadata(melt_wide_metadata(wide, "P1"))
    return input_df, catalog_df, sets_df, ref_df


def test_blacklist_filters_bioproject(spark, fixture):
    input_df, catalog_df, _, _ = fixture
    resolved = resolve_and_normalize(input_df, catalog_df, MwasConfig(blacklist=("P2",)))
    assert resolved.filter(F.col("bio_project") == "P2").count() == 0
    assert resolved.filter(F.col("bio_project") == "P1").count() == 6


def test_t_test_only_forces_t_branch(spark, fixture):
    input_df, catalog_df, sets_df, ref_df = fixture
    out = run_mwas(input_df, catalog_df, sets_df, ref_df, MwasConfig(t_test_only=True))
    statuses = {r["status"].split(";")[0] for r in out.collect()}
    assert statuses <= {"t_test", "skipped_statistical_testing"}
    assert "t_test" in statuses


def test_already_normalized_skips_rpm(spark, fixture):
    input_df, catalog_df, _, _ = fixture
    resolved = resolve_and_normalize(
        input_df, catalog_df, MwasConfig(already_normalized=True)
    )
    vals = {r["run"]: r["rpm"] for r in resolved.collect()}
    assert vals["R1"] == pytest.approx(10.0)  # quantifier passes through


def test_explicit_zeros_permutation_path(spark, fixture):
    """Permutation branch under explicit zeros: pooled = observed values
    only (no zero padding), cohort sizes count observed biosamples, and
    p-values stay valid. Needs cohorts >= 4 per side: 10 biosamples
    split 5/5, 8 of them observed."""
    input_df = spark.createDataFrame(
        [(f"R{i:02d}", "g1", float(3 * i + 1)) for i in range(1, 10)], INPUT_SCHEMA
    )
    catalog_df = spark.createDataFrame(
        [("P9", f"SAMX{i:02d}", f"R{i:02d}", 1_000_000) for i in range(1, 11)],
        CATALOG_SCHEMA,
    )
    wide = spark.createDataFrame(
        [(f"SAMX{i:02d}", "a" if i <= 5 else "b") for i in range(1, 11)],
        ["biosample_id", "t1"],
    )
    sets_df, ref_df = condense_metadata(melt_wide_metadata(wide, "P9"))
    out = run_mwas(
        input_df, catalog_df, sets_df, ref_df,
        MwasConfig(implicit_zeros=False, permutation_resamples=500),
    ).collect()
    perm_rows = [r for r in out if r["status"].startswith("permutation")]
    assert perm_rows, "fixture must reach the permutation branch"
    for r in perm_rows:
        assert r["num_true"] + r["num_false"] == 9  # observed biosamples only
        assert 0.0 < r["p_value"] <= 1.0


def test_explicit_zeros_counts_observed_only(spark, fixture):
    """implicit_zeros=False: cohort sizes count OBSERVED biosamples, not
    the metadata universe (reference --explicit-zeros semantics)."""
    input_df, catalog_df, sets_df, ref_df = fixture
    # observe only 4 of the 6 metadata biosamples
    partial = input_df.filter(F.col("run").isin("R1", "R2", "R4", "R5"))
    out_implicit = run_mwas(partial, catalog_df, sets_df, ref_df, MwasConfig(t_test_only=True))
    out_explicit = run_mwas(
        partial, catalog_df, sets_df, ref_df,
        MwasConfig(t_test_only=True, implicit_zeros=False),
    )
    tot_implicit = {
        (r["metadata_field"], r["metadata_value"]): r["num_true"] + r["num_false"]
        for r in out_implicit.collect()
    }
    tot_explicit = {
        (r["metadata_field"], r["metadata_value"]): r["num_true"] + r["num_false"]
        for r in out_explicit.collect()
    }
    assert all(v == 6 for v in tot_implicit.values()) and tot_implicit
    assert all(v == 4 for v in tot_explicit.values()) and tot_explicit


def test_legacy_output_mode(spark, fixture):
    """legacy_output (old/mwas_rfam.py:100-111,369-370): numeric ±inf fold
    change instead of sentinel strings, output sorted by p-value."""
    input_df, catalog_df, sets_df, ref_df = fixture
    main = run_mwas(
        input_df, catalog_df, sets_df, ref_df, MwasConfig(t_test_only=True)
    ).collect()
    legacy_df = run_mwas(
        input_df, catalog_df, sets_df, ref_df,
        MwasConfig(t_test_only=True, legacy_output=True),
    )
    assert dict(legacy_df.dtypes)["fold_change"] == "double"
    legacy = legacy_df.collect()
    assert len(legacy) == len(main)

    def key(r):
        return (r["bioproject"], r["group"], r["metadata_field"], r["metadata_value"])

    by_key = {key(r): r for r in legacy}
    for m in main:
        l = by_key[key(m)]
        if m["fold_change"] is None:
            assert l["fold_change"] is None
        elif m["fold_change"] == "inf":
            assert l["fold_change"] == float("inf")
        elif m["fold_change"] == "negative inf":
            assert l["fold_change"] == float("-inf")
        elif m["fold_change"] == "0":
            assert l["fold_change"] == 0.0
        else:
            assert l["fold_change"] == pytest.approx(float(m["fold_change"]))
    # p-sorted, None/NaN last (pandas sort_values parity)
    ps = [r["p_value"] for r in legacy]
    non_null = [p for p in ps if p is not None]
    assert ps[: len(non_null)] == sorted(non_null)
    assert all(p is None for p in ps[len(non_null):])


def test_legacy_13col_schema(spark, fixture):
    """legacy_13col (old/mwas_rfam.py:11-12 MWAS_COLS, :169-170
    output_cols): the narrow 13-column frame — legacy column names, no
    status/telemetry/list columns, numeric fold change, global p-sort —
    and a finalize stage that collapses to one projection (no
    biosamples_ref join in the plan)."""
    input_df, catalog_df, sets_df, ref_df = fixture
    out = run_mwas(
        input_df, catalog_df, sets_df, ref_df,
        MwasConfig(t_test_only=True, legacy_13col=True),
    )
    assert out.columns == [
        "bioproject_id", "family", "metadata_field", "metadata_value",
        "num_true", "num_false", "mean_rpm_true", "mean_rpm_false",
        "sd_rpm_true", "sd_rpm_false", "fold_change", "test_statistic",
        "p_value",
    ]
    assert dict(out.dtypes)["fold_change"] == "double"
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    # the finalize list-building (and its biosamples_ref join) must be
    # absent; "too many biosamples" is its unique physical-plan marker
    assert "too many biosamples" not in plan

    rows = out.collect()
    # same tests as the 18-col frame, narrowed
    full = run_mwas(
        input_df, catalog_df, sets_df, ref_df,
        MwasConfig(t_test_only=True, legacy_output=True),
    ).collect()
    assert len(rows) == len(full)
    by_key = {
        (r["bioproject"], r["group"], r["metadata_field"], r["metadata_value"]): r
        for r in full
    }
    for r in rows:
        m = by_key[
            (r["bioproject_id"], r["family"], r["metadata_field"], r["metadata_value"])
        ]
        assert r["num_true"] == m["num_true"] and r["num_false"] == m["num_false"]
        assert r["fold_change"] == m["fold_change"] or (
            r["fold_change"] is None and m["fold_change"] is None
        )
    ps = [r["p_value"] for r in rows]
    non_null = [p for p in ps if p is not None]
    assert ps[: len(non_null)] == sorted(non_null)
    assert all(p is None for p in ps[len(non_null):])


def test_max_group_observations_guard(spark, fixture):
    """The pooled-vector width guard must fail loudly, naming the group,
    instead of OOMing inside the permutation kernel."""
    input_df = spark.createDataFrame(
        [(f"R{i:02d}", "g1", float(3 * i + 1)) for i in range(1, 10)], INPUT_SCHEMA
    )
    catalog_df = spark.createDataFrame(
        [("P9", f"SAMX{i:02d}", f"R{i:02d}", 1_000_000) for i in range(1, 11)],
        CATALOG_SCHEMA,
    )
    wide = spark.createDataFrame(
        [(f"SAMX{i:02d}", "a" if i <= 5 else "b") for i in range(1, 11)],
        ["biosample_id", "t1"],
    )
    sets_df, ref_df = condense_metadata(melt_wide_metadata(wide, "P9"))
    with pytest.raises(Exception, match="max_group_observations"):
        run_mwas(
            input_df, catalog_df, sets_df, ref_df,
            MwasConfig(permutation_resamples=100, max_group_observations=3),
        ).collect()
    # and the default cap must not trip on the same data
    assert (
        run_mwas(
            input_df, catalog_df, sets_df, ref_df,
            MwasConfig(permutation_resamples=100),
        ).count()
        > 0
    )
    # with t_test_only the permutation kernel never consumes the vector,
    # so the width guard must not fire even at an absurdly small cap
    assert (
        run_mwas(
            input_df, catalog_df, sets_df, ref_df,
            MwasConfig(t_test_only=True, max_group_observations=1),
        ).count()
        > 0
    )
