"""Numeric kernel tests — no Spark needed.

Golden values from closed forms (t-dist df=1 is Cauchy, df=2 has an
algebraic CDF) and standard t-tables; permutation exact mode checked
against brute-force enumeration.
"""

import math

import numpy as np
import pytest

from mwas_rfam_spark.functions.stattests import (
    betainc_reg,
    permutation_test_mean_diff,
    student_t_sf,
    welch_ttest_from_stats,
)


def test_betainc_closed_forms():
    # I_x(1, 1) = x
    assert betainc_reg(1, 1, 0.3) == pytest.approx(0.3, abs=1e-12)
    # I_x(2, 2) = x^2 (3 - 2x)
    x = 0.7
    assert betainc_reg(2, 2, x) == pytest.approx(x * x * (3 - 2 * x), abs=1e-12)
    # symmetry I_x(a,b) = 1 - I_{1-x}(b,a)
    assert betainc_reg(2.5, 1.5, 0.4) == pytest.approx(
        1 - betainc_reg(1.5, 2.5, 0.6), abs=1e-12
    )


def test_student_t_sf_cauchy():
    # df=1 → Cauchy: sf(t) = 0.5 - arctan(t)/pi
    for t in [-3.0, -1.0, 0.0, 0.5, 1.0, 2.5, 10.0]:
        expect = 0.5 - math.atan(t) / math.pi
        assert student_t_sf(t, 1.0) == pytest.approx(expect, rel=1e-10)


def test_student_t_sf_df2():
    # df=2 → sf(t) = 0.5 * (1 - t / sqrt(2 + t^2))
    for t in [-2.0, 0.0, 1.0, 3.0]:
        expect = 0.5 * (1 - t / math.sqrt(2 + t * t))
        assert student_t_sf(t, 2.0) == pytest.approx(expect, rel=1e-10)


def test_student_t_table_values():
    # classic critical values: P(T > t_crit) = 0.025
    assert student_t_sf(2.228, 10) == pytest.approx(0.025, abs=2e-4)
    assert student_t_sf(2.086, 20) == pytest.approx(0.025, abs=2e-4)
    assert student_t_sf(1.96, 1e6) == pytest.approx(0.025, abs=2e-4)


def test_welch_known_example():
    # textbook Welch example (e.g. Wikipedia "Welch's t-test" example 1-like):
    # verify against an independent implementation of the formulas
    m1, s1, n1 = 20.0, 2.0, 10
    m2, s2, n2 = 22.0, 4.0, 12
    t, df, p = welch_ttest_from_stats(m1, s1, n1, m2, s2, n2)
    vn1, vn2 = s1 * s1 / n1, s2 * s2 / n2
    t_expect = (m1 - m2) / math.sqrt(vn1 + vn2)
    df_expect = (vn1 + vn2) ** 2 / (vn1**2 / (n1 - 1) + vn2**2 / (n2 - 1))
    assert float(t) == pytest.approx(t_expect, rel=1e-12)
    assert float(df) == pytest.approx(df_expect, rel=1e-12)
    assert 0.0 < float(p) < 1.0
    # p must equal 2*sf(|t|, df)
    assert float(p) == pytest.approx(2 * float(student_t_sf(abs(t_expect), df_expect)), rel=1e-10)


def test_welch_identical_groups_p_one():
    t, df, p = welch_ttest_from_stats(5.0, 1.0, 10, 5.0, 1.0, 10)
    assert float(t) == 0.0
    assert float(p) == pytest.approx(1.0, abs=1e-12)


def test_permutation_exact_brute_force():
    x = np.array([1.0, 2.0, 3.0, 10.0])
    y = np.array([1.5, 2.5, 0.5, 1.0])
    stat, p = permutation_test_mean_diff(x, y, n_resamples=10_000)
    # C(8,4)=70 → exact mode; brute-force check
    from itertools import combinations

    pooled = np.concatenate([x, y])
    obs = x.mean() - y.mean()
    null = []
    for comb in combinations(range(8), 4):
        m = np.zeros(8, bool)
        m[list(comb)] = True
        null.append(pooled[m].mean() - pooled[~m].mean())
    null = np.array(null)
    gamma = 1e-14 * max(1, abs(obs), float(np.abs(pooled).max()))
    p_ge = (null >= obs - gamma).sum() / 70
    p_le = (null <= obs + gamma).sum() / 70
    expect = min(1.0, 2 * min(p_ge, p_le))
    assert stat == pytest.approx(obs)
    assert p == pytest.approx(expect, abs=1e-12)


def test_permutation_randomized_seeded_reproducible():
    rng_x = np.random.default_rng(7)
    x = rng_x.normal(0.0, 1.0, 12)
    y = rng_x.normal(3.0, 1.0, 12)  # C(24,12) >> 10k → randomized
    s1, p1 = permutation_test_mean_diff(x, y, 10_000, rng=123)
    s2, p2 = permutation_test_mean_diff(x, y, 10_000, rng=123)
    assert (s1, p1) == (s2, p2)
    # a real shift should be detected
    assert p1 < 0.05


def test_permutation_null_uniformish():
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, 10)
    y = rng.normal(0, 1, 10)
    _, p = permutation_test_mean_diff(x, y, 5_000, rng=1)
    assert p > 0.05  # same distribution → not significant


def test_welch_df_zero_returns_nan_not_crash():
    """r12 review finding: df computing to exactly 0 (nobs=1 with a
    positive SD on one side) made math.lgamma(0) raise ValueError
    inside the p-value batch; scipy parity is NaN."""
    t, df, p = welch_ttest_from_stats(1.0, 1.0, 1, 0.0, 1.0, 5)
    assert df == 0.0
    assert math.isnan(p)


def test_comb_at_most_exact_and_capped():
    """r12 review finding: exact math.comb on cap-scale groups costs
    seconds per set row; the early-exit partial product is exact below
    the cap and merely 'too big' above it."""
    import math as _m

    from mwas_rfam_spark.functions.stattests import comb_at_most

    for n, k in [(10, 3), (22, 11), (5, 0), (5, 5), (7, 9)]:
        want = _m.comb(n, k) if k <= n else 0
        assert comb_at_most(n, k, 10_000) == min(want, 10_001) or want <= 10_000
        if want <= 10_000:
            assert comb_at_most(n, k, 10_000) == want
    assert comb_at_most(1_000_000, 500_000, 10_000) == 10_001  # instant


def test_permutation_kernels_validate_cohorts():
    """r12 review finding: n_x=0 crashed in an obscure reshape and
    n_x=n silently returned p=0.0 (maximally significant)."""
    from mwas_rfam_spark.functions.stattests import (
        grouped_permutation_mean_diff,
        permutation_test_mean_diff,
    )

    pooled = np.array([1.0, 2.0, 3.0, 4.0])
    with pytest.raises(ValueError, match="0 < n_x < n"):
        grouped_permutation_mean_diff(pooled, [0], [0.0], 100, 0)
    with pytest.raises(ValueError, match="0 < n_x < n"):
        grouped_permutation_mean_diff(pooled, [4], [0.0], 100, 0)
    with pytest.raises(ValueError, match="non-empty"):
        permutation_test_mean_diff([], [1.0, 2.0])


def test_permutation_kernels_refuse_non_finite_inputs():
    """r13 review finding (same class as the r12 n_x=n hole): a NaN in
    pooled values or a NaN observed made every >=/<= tie comparison
    False, so both permutation paths silently returned p=0.0 — maximally
    SIGNIFICANT — instead of failing loud. One NaN rpm in a group would
    have flooded that (bioproject, group) with false hits."""
    from mwas_rfam_spark.functions.stattests import (
        grouped_permutation_mean_diff,
        permutation_test_mean_diff,
    )

    ok = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    with pytest.raises(ValueError, match="finite"):
        grouped_permutation_mean_diff(
            np.append(ok, np.nan), [3], [0.5], 100, 0
        )
    with pytest.raises(ValueError, match="finite"):
        grouped_permutation_mean_diff(
            np.append(ok, np.inf), [3], [0.5], 100, 0
        )
    with pytest.raises(ValueError, match="finite"):
        grouped_permutation_mean_diff(ok, [3], [np.nan], 100, 0)
    with pytest.raises(ValueError, match="finite"):
        permutation_test_mean_diff([1.0, np.nan, 2.0], [3.0, 4.0, 5.0])
    with pytest.raises(ValueError, match="finite"):
        permutation_test_mean_diff([1.0, 2.0], [3.0, np.inf])
    # the randomized path validates too (large n forces it)
    big = np.arange(60, dtype=np.float64)
    with pytest.raises(ValueError, match="finite"):
        grouped_permutation_mean_diff(
            np.append(big, np.nan), [20], [0.1], 50, 0
        )
