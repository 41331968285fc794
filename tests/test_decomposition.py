"""Embedding dimensionality reduction: seeded JL random projection and
distributed PCA (operators/decomposition)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mwas_rfam_spark.operators.decomposition import (
    PROJECT_CODEGEN_MAX_TERMS,
    _project_arrow,
    fit_pca,
    pca_project,
    project_embeddings,
    random_projection_planes,
)


def _emb_df(spark, X):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )


def test_projection_matches_numpy_and_arrow_path(spark):
    """The inline-expression and Arrow GEMM paths are the SAME linear
    map: both equal numpy X @ M.T (with and without the mean shift)."""
    rng = np.random.default_rng(0)
    X = rng.standard_normal((40, 12))
    M = rng.standard_normal((5, 12)).tolist()
    mu = rng.standard_normal(12).tolist()
    df = _emb_df(spark, X)

    for shift, ref in [
        (None, X @ np.asarray(M).T),
        (mu, (X - np.asarray(mu)) @ np.asarray(M).T),
    ]:
        got_expr = {
            r["vec_id"]: r["embedding"]
            for r in project_embeddings(df, M, shift=shift).collect()
        }
        got_arrow = {
            r["vec_id"]: r["embedding"]
            for r in _project_arrow(df, M, "embedding", "embedding", shift).collect()
        }
        for i in range(len(X)):
            np.testing.assert_allclose(got_expr[i], ref[i], atol=1e-9)
            np.testing.assert_allclose(got_arrow[i], ref[i], atol=1e-9)

    # the dispatcher takes the kernel past the term cutover and stays right
    big_out = PROJECT_CODEGEN_MAX_TERMS // 12 + 1
    M_big = rng.standard_normal((big_out, 12)).tolist()
    got = {
        r["vec_id"]: r["embedding"]
        for r in project_embeddings(df, M_big).collect()
    }
    ref = X @ np.asarray(M_big).T
    for i in range(len(X)):
        np.testing.assert_allclose(got[i], ref[i], atol=1e-9)

    # out_col != vec_col keeps the source column and passthroughs
    out = project_embeddings(df, M, out_col="reduced").collect()
    assert {"vec_id", "embedding", "reduced"} == set(out[0].asDict())

    with pytest.raises(ValueError, match="matrix"):
        project_embeddings(df, [])
    with pytest.raises(ValueError, match="shift"):
        project_embeddings(df, M, shift=[0.0])


def test_projection_null_semantics_match_across_paths(spark):
    """NULL / wrong-dim vectors project to NULL on BOTH physical paths
    (the Arrow kernel must not crash the task), and fit_pca excludes
    NULL embeddings from the moments instead of failing."""
    rng = np.random.default_rng(5)
    M = rng.standard_normal((3, 4)).tolist()
    messy = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0, 4.0]), (1, None), (2, [1.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    for fn in (
        lambda df: project_embeddings(df, M),
        lambda df: _project_arrow(df, M, "embedding", "embedding", None),
    ):
        got = {r["vec_id"]: r["embedding"] for r in fn(messy).collect()}
        assert got[0] is not None and len(got[0]) == 3
        assert got[1] is None and got[2] is None

    clean = np.asarray([[1.0, 2.0, 3.0, 4.0], [2.0, 1.0, 0.0, -1.0],
                        [0.0, 0.0, 1.0, 1.0]])
    with_null = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(clean)] + [(9, None)],
        "vec_id long, embedding array<double>",
    )
    model = fit_pca(with_null, k=2)
    np.testing.assert_allclose(model["mean"], clean.mean(axis=0), atol=1e-12)


def test_jl_planes_deterministic_and_distance_preserving(spark):
    """JL contract: planes are a pure function of (dims, seed), and
    pairwise squared distances are preserved within the lemma's
    tolerance at a healthy out_dim."""
    assert random_projection_planes(16, 8) == random_projection_planes(16, 8)
    assert random_projection_planes(16, 8, seed=9) != random_projection_planes(16, 8)

    rng = np.random.default_rng(1)
    X = rng.standard_normal((30, 64))
    planes = random_projection_planes(64, 32)
    got = {
        r["vec_id"]: np.asarray(r["embedding"])
        for r in project_embeddings(_emb_df(spark, X), planes).collect()
    }
    ratios = []
    for i in range(len(X)):
        for j in range(i + 1, len(X)):
            d_full = np.sum((X[i] - X[j]) ** 2)
            d_red = np.sum((got[i] - got[j]) ** 2)
            ratios.append(d_red / d_full)
    # E[ratio] = 1; at out_dim=32 the spread is wide but bounded
    assert 0.9 < float(np.mean(ratios)) < 1.1
    assert 0.3 < min(ratios) and max(ratios) < 2.5


def test_fit_pca_matches_numpy_reference(spark):
    """Distributed mean/covariance + driver eigh == numpy PCA on the
    collected corpus: mean exact, components span the same subspace
    (compared via projections, robust to sign), variance descending,
    partitioning-independent."""
    rng = np.random.default_rng(2)
    # anisotropic cloud: a known dominant direction
    base = rng.standard_normal((200, 6)) * np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    Q, _ = np.linalg.qr(rng.standard_normal((6, 6)))
    X = base @ Q + np.array([1.0, -2.0, 0.5, 0.0, 3.0, -1.0])

    model = fit_pca(_emb_df(spark, X).repartition(7), k=3)
    np.testing.assert_allclose(model["mean"], X.mean(axis=0), atol=1e-9)

    cov = np.cov(X, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    ref_vals = vals[::-1][:3]
    ref_comps = vecs[:, np.argsort(vals)[::-1][:3]].T
    np.testing.assert_allclose(model["explained_variance"], ref_vals, atol=1e-8)
    got_comps = np.asarray(model["components"])
    for g, r in zip(got_comps, ref_comps):
        # same axis up to sign
        assert abs(abs(float(g @ r)) - 1.0) < 1e-8
        np.testing.assert_allclose(np.abs(g), np.abs(r), atol=1e-7)
    # orthonormal
    np.testing.assert_allclose(got_comps @ got_comps.T, np.eye(3), atol=1e-9)

    # partitioning robustness: a different split permutes the fp
    # summation order, so agreement is to ulp-level tolerance (the sign
    # convention keeps components from flipping outright)
    model2 = fit_pca(_emb_df(spark, X).repartition(3), k=3)
    np.testing.assert_allclose(model2["mean"], model["mean"], rtol=1e-12)
    np.testing.assert_allclose(model2["components"], model["components"], atol=1e-9)

    # projection: variance concentrates, reconstruction error shrinks in k
    proj = {
        r["vec_id"]: np.asarray(r["embedding"])
        for r in pca_project(_emb_df(spark, X), model).collect()
    }
    Y = np.stack([proj[i] for i in range(len(X))])
    np.testing.assert_allclose(Y.var(axis=0, ddof=0), ref_vals, rtol=1e-6)

    with pytest.raises(ValueError, match="k="):
        fit_pca(_emb_df(spark, X), k=7)
    with pytest.raises(ValueError, match="k must"):
        fit_pca(_emb_df(spark, X), k=0)


def test_pca_composes_with_ann(spark, sf_dir):
    """The reduced column feeds the existing ANN operators unchanged.

    Two claims, kept separate because the REAL testdata embeddings are
    near-isotropic (flat eigenspectrum — measured 0.029..0.007), where
    NO 8-dim reduction can preserve neighborhoods:

    1. composition exactness on the real corpus: Spark brute-force
       top-k over the reduced column == numpy top-k in the same
       reduced space;
    2. recall on data WITH low-dim structure (clusters planted in a
       4-dim subspace of 64-dim space): PCA-4 recovers the full-space
       neighborhood.
    """
    from mwas_rfam_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    model = fit_pca(emb, k=8)
    reduced = pca_project(emb, model).localCheckpoint()

    rows = emb.orderBy("vec_id").collect()
    X = np.stack([np.asarray(r["embedding"]) for r in rows])
    ids = [r["vec_id"] for r in rows]
    q_full = X[0]
    q_red = (q_full - np.asarray(model["mean"])) @ np.asarray(model["components"]).T

    got = [r["vec_id"] for r in brute_force_topk(reduced, q_red.tolist(), k=10).collect()]
    Y = (X - np.asarray(model["mean"])) @ np.asarray(model["components"]).T
    cos = (Y @ q_red) / (np.linalg.norm(Y, axis=1) * np.linalg.norm(q_red))
    # replicate the operator's tie-break: cosine desc, id asc
    want = [ids[i] for i in sorted(range(len(ids)), key=lambda i: (-round(cos[i], 12), ids[i]))[:10]]
    assert got == want

    # planted structure: 10 cluster centers inside a 4-dim subspace
    rng = np.random.default_rng(4)
    basis, _ = np.linalg.qr(rng.standard_normal((64, 4)))
    centers = rng.standard_normal((10, 4)) * 5.0
    Z = np.repeat(centers, 30, axis=0) @ basis.T + rng.standard_normal((300, 64)) * 0.05
    zdf = _emb_df(spark, Z)
    pmodel = fit_pca(zdf, k=4)
    zred = pca_project(zdf, pmodel).localCheckpoint()
    qz = Z[0]
    qz_red = (qz - np.asarray(pmodel["mean"])) @ np.asarray(pmodel["components"]).T
    top_full = {
        r["vec_id"] for r in brute_force_topk(_emb_df(spark, Z), qz.tolist(), k=10).collect()
    }
    top_red = {
        r["vec_id"] for r in brute_force_topk(zred, qz_red.tolist(), k=10).collect()
    }
    # neighborhood survives at CLUSTER granularity: within a cluster the
    # 30 members are near-ties (ranked by the noise dims PCA discards),
    # so exact member overlap is not the invariant — membership is
    assert all(v // 30 == 0 for v in top_full)  # sanity: full space finds cluster 0
    assert all(v // 30 == 0 for v in top_red)  # ...and so does 4-dim PCA space


def test_jl_projection_duckdb_parity(spark, sf_dir):
    """Cross-engine: the seeded planes are emitted as 17-significant-
    digit literals (the LSH-oracle recipe), so DuckDB reproduces the
    projected vectors bit-for-bit at round-6 tolerance on the real
    embeddings table."""
    import duckdb

    planes = random_projection_planes(64, 4, seed=11)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    got = {
        r["vec_id"]: [round(x, 6) for x in r["embedding"]]
        for r in project_embeddings(
            emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")),
            planes,
        ).collect()
    }

    def arr(p):
        return "CAST([" + ", ".join(repr(float(x)) for x in p) + "] AS DOUBLE[])"

    cols = ",\n".join(
        f"round(list_inner_product(CAST(embedding AS DOUBLE[]), {arr(p)}), 6) AS c{i}"
        for i, p in enumerate(planes)
    )
    con = duckdb.connect()
    want = {
        r[0]: [r[1], r[2], r[3], r[4]]
        for r in con.execute(
            f"SELECT vec_id, {cols} FROM read_parquet('{sf_dir}/embeddings.parquet')"
        ).fetchall()
    }
    con.close()
    assert got == want and len(got) > 0


def test_fit_pca_excludes_null_elements(spark):
    """A vector with a NULL ELEMENT (not just a NULL array) is excluded
    from the fit — it would otherwise round-trip through Arrow as NaN
    and silently poison every moment sum."""
    clean = np.asarray([[1.0, 2.0], [3.0, 0.0], [0.0, 1.0]])
    df = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(clean)]
        + [(8, None), (9, [1.0, None])],
        "vec_id long, embedding array<double>",
    )
    model = fit_pca(df, k=1)
    np.testing.assert_allclose(model["mean"], clean.mean(axis=0), atol=1e-12)
    assert np.isfinite(model["explained_variance"][0])


def test_out_col_follows_vec_col(spark):
    """r12 review finding: the literal 'embedding' out_col default
    meant project_embeddings(emb, M, vec_col='vec') wrote the rotated
    vectors to a NEW column and callers kept reading the unrotated one
    (train_opq trained codebooks on unrotated data for any non-default
    vec_col)."""
    from mwas_rfam_spark.operators.decomposition import project_embeddings

    df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, vec array<double>")
    out = project_embeddings(df, [[0.0, 1.0], [1.0, 0.0]], vec_col="vec")
    assert out.columns == ["id", "vec"]  # replaced in place, no extra col
    assert out.collect()[0]["vec"] == [2.0, 1.0]


def test_null_and_nan_elements_null_output_both_paths(spark):
    """r12 review finding: a NULL element produced an all-NULL-element
    array inline but finite-looking NaNs through Arrow — behavior
    flipped on matrix size. Both paths now yield a NULL output array."""
    import mwas_rfam_spark.operators.decomposition as deco
    from mwas_rfam_spark.operators.decomposition import project_embeddings

    df = spark.createDataFrame(
        [(1, [1.0, None]), (2, [1.0, float("nan")]), (3, [1.0, 2.0])],
        "id long, embedding array<double>",
    )
    m = [[1.0, 1.0]]
    inline = {r["id"]: r["embedding"] for r in project_embeddings(df, m).collect()}
    old_cap = deco.PROJECT_CODEGEN_MAX_TERMS
    try:
        deco.PROJECT_CODEGEN_MAX_TERMS = 0  # force the Arrow path
        arrow = {r["id"]: r["embedding"] for r in project_embeddings(df, m).collect()}
    finally:
        deco.PROJECT_CODEGEN_MAX_TERMS = old_cap
    assert inline == arrow
    assert inline[1] is None and inline[2] is None
    assert inline[3] == [3.0]


def test_fit_pca_excludes_nan_inf_vectors(spark):
    """r12 review finding: a NaN/Inf element silently poisoned the
    moment sums (the docstring's exact claim was NULL-only)."""
    from mwas_rfam_spark.operators.decomposition import fit_pca

    rows = [([float(i), float(-i)],) for i in range(1, 20)]
    dirty = rows + [([float("nan"), 1.0],), ([float("inf"), 1.0],)]
    m_clean = fit_pca(spark.createDataFrame(rows, "embedding array<double>"), 1)
    m_dirty = fit_pca(spark.createDataFrame(dirty, "embedding array<double>"), 1)
    assert m_clean["mean"] == m_dirty["mean"]
    assert m_clean["components"] == m_dirty["components"]
