"""End-to-end MWAS pipeline test.

Oracle: an independent plain-Python re-implementation of the reference
algorithm (dense per-group vectors, per-set cohort loop — following
main/mwas_general.py:344-546 semantics) using the same numeric kernels.
The Spark engine must reproduce it row-for-row, including the seeded
permutation branch (seeds derived identically from the set signature).
"""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mwas_rfam_spark.config import MwasConfig
from mwas_rfam_spark.functions.stattests import (
    grouped_permutation_mean_diff,
    mean_diff_statistic,
    welch_ttest_from_stats,
)
from mwas_rfam_spark.operators.condense import condense_metadata
from mwas_rfam_spark.operators.mwas import run_mwas
from mwas_rfam_spark.schemas import CATALOG_SCHEMA, INPUT_SCHEMA
from mwas_rfam_spark.sources.readers import melt_wide_metadata

CFG = MwasConfig(permutation_resamples=2000, permutation_seed=42)

# 9 biosamples: tissue liver{1..4}/brain{5..9}; depth coincides with tissue
# (dedup); 'site' gives a 3-member cohort (t-test branch); const/unique pruned
META_ROWS = [
    ("SAM01", "c", "u1", "liver", "deep", "north"),
    ("SAM02", "c", "u2", "liver", "deep", "north"),
    ("SAM03", "c", "u3", "liver", "deep", "north"),
    ("SAM04", "c", "u4", "liver", "deep", "south"),
    ("SAM05", "c", "u5", "brain", "shallow", "south"),
    ("SAM06", "c", "u6", "brain", "shallow", "south"),
    ("SAM07", "c", "u7", "brain", "shallow", "south"),
    ("SAM08", "c", "u8", "brain", "shallow", "south"),
    ("SAM09", "c", "u9", "brain", "shallow", "south"),
]
META_COLS = ["biosample_id", "const_col", "unique_col", "tissue", "depth", "site"]

# catalog: SAM01 has two runs (rollup-mean path); R00 spots=0 (sentinel);
# R90 maps to a biosample missing from metadata; input has run R99 unknown
# to the catalog (outer-join path)
CATALOG = [
    ("PRJT1", "SAM01", "R00", 0),
    ("PRJT1", "SAM01", "R01", 2_000_000),
    ("PRJT1", "SAM02", "R02", 1_000_000),
    ("PRJT1", "SAM03", "R03", 4_000_000),
    ("PRJT1", "SAM04", "R04", 1_000_000),
    ("PRJT1", "SAM05", "R05", 2_000_000),
    ("PRJT1", "SAM06", "R06", 1_000_000),
    ("PRJT1", "SAM07", "R07", 1_000_000),
    ("PRJT1", "SAM08", "R08", 500_000),
    ("PRJT1", "SAM09", "R09", 1_000_000),
    ("PRJT1", "SAM90", "R90", 1_000_000),
]

INPUT = (
    # group g1: all biosamples observed → permutation for 4/5 cohorts
    [("R00", "g1", 100.0), ("R01", "g1", 300.0), ("R02", "g1", 250.0),
     ("R03", "g1", 1200.0), ("R04", "g1", 80.0), ("R05", "g1", 20.0),
     ("R06", "g1", 15.0), ("R07", "g1", 10.0), ("R08", "g1", 5.0),
     ("R09", "g1", 12.0), ("R90", "g1", 7.0)]
    # group g2: only 2 rows → below nonzeros threshold → skipped rows
    + [("R02", "g2", 50.0), ("R03", "g2", 60.0)]
    # unknown run
    + [("R99", "g1", 999.0)]
)


def _expected():
    """Plain-Python reference simulation (independent of the Spark plan)."""
    spots = {}
    run_to_bs = {}
    for bp, bs, run, sp in CATALOG:
        spots[run] = sp if sp != 0 else 1_000_000
        run_to_bs[run] = bs

    biosamples = sorted({r[0] for r in META_ROWS})
    n = len(biosamples)
    meta = {c: [row[i] for row in META_ROWS] for i, c in enumerate(META_COLS)}

    # set making (reference msm:13-110 semantics, normalized n)
    sets = {}  # matching_tuple -> [attrs, values, include, members]
    for ci, col in enumerate(META_COLS[1:], start=1):
        vals = meta[col]
        informative = [v for v in vals if v is not None and v != "nan"]
        nunique = len(set(informative))
        if nunique <= 1 or nunique == n:
            continue
        for factor in sorted(set(informative)):
            matching = tuple(
                sorted(b for b, v in zip(meta["biosample_id"], vals) if v == factor)
            )
            cnt = len(matching)
            if cnt < 2 or cnt >= n:
                continue
            include = cnt < n / 2
            members = (
                list(matching)
                if include
                else [b for b in biosamples if b not in matching]
            )
            if matching in sets:
                sets[matching][0] += f"; {col}"
                sets[matching][1] += f"; {factor}"
            else:
                sets[matching] = [col, factor, include, members]

    # rpm vectors per group (implicit zeros)
    rows_by_group = {}
    for run, g, q in INPUT:
        rows_by_group.setdefault(g, []).append((run, q))
    results = []
    for g, rows in rows_by_group.items():
        per_bs = {}
        for run, q in rows:
            if run not in run_to_bs:
                continue
            bs = run_to_bs[run]
            per_bs.setdefault(bs, []).append(q / spots[run] * 1e6)
        vec = np.zeros(n)
        for bs, v in per_bs.items():
            if bs in biosamples:
                vec[biosamples.index(bs)] = float(np.mean(v))
        # catalog-resolved rows only: an unknown run (R99) never lands
        # in a bioproject's group subset, so it must not count toward
        # the skip threshold (r11 review finding — the raw-row count
        # silently diverged from the engine's rule at the boundary)
        n_resolved = sum(1 for run, _ in rows if run in run_to_bs)
        skip = n_resolved < CFG.group_nonzeros_threshold
        for matching, (attrs, values, include, members) in sets.items():
            member_idx = [biosamples.index(b) for b in members]
            mask = np.zeros(n, bool)
            mask[member_idx] = True
            true_mask = mask if include else ~mask
            x, y = vec[true_mask], vec[~true_mask]
            if len(x) < 2 or len(y) < 2:
                continue
            mt, mf = float(np.mean(x)), float(np.mean(y))
            st, sf_ = float(np.std(x)), float(np.std(y))
            if mt == mf == 0:
                continue
            set_id = hashlib.sha256("\x1f".join(matching).encode()).hexdigest()
            if skip:
                status, stat, p, fold = "skipped_statistical_testing", None, None, None
            else:
                if mt == 0 and mf == 0:
                    fold = "0"
                elif mt == 0:
                    fold = "negative inf"
                elif mf == 0:
                    fold = "inf"
                else:
                    fold = str(math.log2(mt / mf))
                if min(len(x), len(y)) < 4:
                    status = "t_test"
                    stat, _, p = welch_ttest_from_stats(mt, st, len(x), mf, sf_, len(y))
                    stat, p = float(stat), float(p)
                else:
                    status = "permutation_test"
                    # group-level seed + shared-null kernel: evaluating one
                    # row alone reproduces the batched p exactly (the
                    # permutation stream never depends on which rows run)
                    seed_hex = hashlib.sha256(f"PRJT1|{g}".encode()).hexdigest()[:15]
                    seed = (int(seed_hex, 16) ^ CFG.permutation_seed) & 0x7FFFFFFFFFFFFFFF
                    stat = mean_diff_statistic(x, y)
                    p = float(
                        grouped_permutation_mean_diff(
                            np.sort(vec),
                            [len(x)],
                            [stat],
                            CFG.permutation_resamples,
                            rng=np.random.default_rng(seed),
                        )[0]
                    )
            sig = p is not None and p < CFG.p_value_threshold
            if sig:
                status += "; significant"
                t_list = members if include else [b for b in biosamples if b not in members]
                f_list = [b for b in biosamples if b not in t_list]
                tb, fb = "; ".join(t_list), "; ".join(f_list)
            else:
                tb = fb = ""
            results.append(
                dict(
                    bioproject="PRJT1", group=g, metadata_field=attrs,
                    metadata_value=values, status=status, num_true=len(x),
                    num_false=len(y), mean_rpm_true=mt, mean_rpm_false=mf,
                    sd_rpm_true=st, sd_rpm_false=sf_, fold_change=fold,
                    test_statistic=stat, p_value=p, true_biosamples=tb,
                    false_biosamples=fb,
                )
            )
    return results


@pytest.fixture(scope="module")
def spark_result(spark):
    input_df = spark.createDataFrame(INPUT, INPUT_SCHEMA)
    catalog_df = spark.createDataFrame(CATALOG, CATALOG_SCHEMA)
    wide = spark.createDataFrame(META_ROWS, META_COLS)
    sets_df, ref_df = condense_metadata(melt_wide_metadata(wide, "PRJT1"))
    out = run_mwas(input_df, catalog_df, sets_df, ref_df, CFG)
    return out.collect()


def _key(r):
    return (r["group"], r["metadata_field"], r["metadata_value"])


def test_e2e_matches_reference_simulation(spark_result):
    expected = {_key(e): e for e in _expected()}
    actual = { _key(r.asDict()): r.asDict() for r in spark_result }
    assert set(actual) == set(expected)
    for k, e in expected.items():
        a = actual[k]
        assert a["status"] == e["status"], (k, a["status"], e["status"])
        assert a["num_true"] == e["num_true"] and a["num_false"] == e["num_false"], k
        for f in ["mean_rpm_true", "mean_rpm_false", "sd_rpm_true", "sd_rpm_false"]:
            assert a[f] == pytest.approx(e[f], rel=1e-9), (k, f)
        if e["test_statistic"] is not None:
            assert a["test_statistic"] == pytest.approx(e["test_statistic"], rel=1e-9), k
            assert a["p_value"] == pytest.approx(e["p_value"], rel=1e-9, abs=1e-12), k
        else:
            assert a["test_statistic"] is None and a["p_value"] is None, k
        if e["fold_change"] is None:
            assert a["fold_change"] is None, k
        elif e["fold_change"] in ("inf", "negative inf", "0"):
            assert a["fold_change"] == e["fold_change"], k
        else:
            assert float(a["fold_change"]) == pytest.approx(float(e["fold_change"]), rel=1e-9), k
        assert a["true_biosamples"] == e["true_biosamples"], k
        assert a["false_biosamples"] == e["false_biosamples"], k


def test_e2e_branches_covered(spark_result):
    statuses = {r["status"].split(";")[0] for r in spark_result}
    assert "t_test" in statuses
    assert "permutation_test" in statuses
    assert "skipped_statistical_testing" in statuses


def test_zero_variance_cohorts_match_reference_not_crash(spark):
    """r11 review finding (reproduced): a t-branch row with BOTH cohort
    SDs zero crashed the whole run under Spark 4's default ANSI mode
    (DIVIDE_BY_ZERO). The reference kernel's numbers for that row are
    t=±inf, df=1, p=0 — perfectly separated cohorts are SIGNIFICANT —
    and equal-mean constant cohorts give t=NaN, p=NaN (not
    significant). The SQL branch must reproduce the numpy kernel."""
    import math

    cat = spark.createDataFrame(
        [("PZ", f"SAM{i}", f"R{i}", 1_000_000) for i in range(1, 6)],
        CATALOG_SCHEMA,
    )
    wide = spark.createDataFrame(
        [(f"SAM{i}", "a" if i <= 2 else "b") for i in range(1, 6)],
        ["biosample_id", "tissue"],
    )
    sets_df, ref_df = condense_metadata(melt_wide_metadata(wide, "PZ"))
    rows = (
        # g1: true cohort {5,5} vs false {0,0,0} — separated, sds 0
        [(f"R{i}", "g1", 5.0) for i in (1, 2)]
        + [(f"R{i}", "g1", 0.0) for i in (3, 4, 5)]
        # g2: both cohorts constant 7 — equal means, sds 0
        + [(f"R{i}", "g2", 7.0) for i in range(1, 6)]
    )
    input_df = spark.createDataFrame(rows, INPUT_SCHEMA)
    out = {
        (r["group"], r["metadata_value"]): r
        for r in run_mwas(input_df, cat, sets_df, ref_df, CFG).collect()
    }
    assert len(out) == 4  # one row per (group, set)

    want_t, want_df, want_p = welch_ttest_from_stats(5.0, 0.0, 2, 0.0, 0.0, 3)
    assert math.isinf(want_t) and want_p == 0.0  # the reference's numbers
    g1a = out[("g1", "a")]
    assert math.isinf(g1a["test_statistic"]) and g1a["test_statistic"] > 0
    assert g1a["p_value"] == 0.0
    assert g1a["status"] == "t_test; significant"
    g1b = out[("g1", "b")]  # the mirrored set: separated the other way
    assert math.isinf(g1b["test_statistic"]) and g1b["test_statistic"] < 0
    assert g1b["p_value"] == 0.0 and g1b["fold_change"] == "negative inf"

    for mv in ("a", "b"):
        g2 = out[("g2", mv)]
        assert math.isnan(g2["test_statistic"])
        # reference p is NaN (0/0 t); the engine surfaces the
        # undecidable row as NULL p — both mean "not significant"
        assert g2["p_value"] is None or math.isnan(g2["p_value"])
        assert g2["status"] == "t_test"


def test_welch_columns_null_sd_yields_null_t(spark):
    """r12 advice: NULL stats must yield NULL t, never ±inf.

    A row with non-NULL, differing means but a NULL sd used to fall
    through the when-chain into the sign-of-md ±inf branches (vsum NULL
    makes `vsum > 0` NULL); the gate keeps it NULL."""
    from mwas_rfam_spark.operators.mwas import _welch_columns

    df = spark.createDataFrame(
        [
            # (id, mean_t, sd_t, n_t, mean_f, sd_f, n_f)
            (0, 5.0, None, 3, 0.0, 1.0, 3),  # NULL sd, means differ
            (1, 5.0, 1.0, 3, 0.0, None, 3),  # NULL sd other side
            (2, None, None, 0, 0.0, 1.0, 3),  # empty cohort: all NULL
            (3, 5.0, 1.0, 3, 0.0, 1.0, 3),  # healthy row for contrast
        ],
        "id long, mean_rpm_true double, sd_rpm_true double, n_true long, "
        "mean_rpm_false double, sd_rpm_false double, n_false long",
    )
    rows = {r["id"]: r for r in _welch_columns(df).collect()}
    assert rows[0]["test_statistic"] is None
    assert rows[1]["test_statistic"] is None
    assert rows[2]["test_statistic"] is None
    assert rows[3]["test_statistic"] is not None and not math.isnan(
        rows[3]["test_statistic"]
    )
