"""Product-quantization tests: codebook determinism, encode validity,
ADC error bound vs exact distance, recall on the driver's embeddings
table, refined search exactness, and index materialization."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mwas_rfam_spark.operators.quantization import (
    adc_lookup_table,
    materialize_pq,
    pq_adc_scores,
    pq_encode,
    pq_topk,
    pq_topk_refined,
    train_pq_codebooks,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def books(emb):
    return train_pq_codebooks(emb, m=8, k=32, iters=5, sample_size=512)


@pytest.fixture(scope="module")
def qvec(emb):
    row = emb.orderBy("vec_id").limit(1).collect()[0]
    return [float(x) for x in row["embedding"]]


def test_codebooks_deterministic(emb, books):
    again = train_pq_codebooks(emb, m=8, k=32, iters=5, sample_size=512)
    assert books == again
    assert len(books) == 8 and all(len(b) == 32 for b in books)
    assert all(len(c) == 8 for b in books for c in b)  # 64 dims / 8 subspaces


def test_encode_codes_valid_and_deterministic(emb, books):
    codes = pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 32 for c in r["codes"])
    again = pq_encode(emb, books).collect()
    assert sorted(map(str, codes)) == sorted(map(str, again))


def test_encode_is_nearest_centroid(emb, books):
    # cross-check a handful of rows against numpy argmin
    rows = emb.orderBy("vec_id").limit(20).collect()
    coded = {
        r["vec_id"]: r["codes"]
        for r in pq_encode(emb.orderBy("vec_id").limit(20), books).collect()
    }
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        for j in range(8):
            sub = v[j * 8 : (j + 1) * 8]
            C = np.asarray(books[j])
            want = int(((C - sub) ** 2).sum(axis=1).argmin())
            assert coded[r["vec_id"]][j] == want


def test_adc_equals_lut_sum(emb, books, qvec):
    """ADC score must be exactly the sum of per-subspace LUT entries."""
    lut = adc_lookup_table(qvec, books)
    codes = pq_encode(emb, books)
    scored = {r["vec_id"]: r["approx_dist"] for r in pq_adc_scores(codes, qvec, books).collect()}
    raw = {r["vec_id"]: r["codes"] for r in codes.collect()}
    for vid, cs in list(raw.items())[:50]:
        want = sum(lut[j][cs[j]] for j in range(8))
        assert scored[vid] == pytest.approx(want, rel=1e-12)


def test_adc_recall_and_refined_exactness(emb, books, qvec):
    """ADC top-k recovers part of the exact L2 top-k; the refined
    two-stage search recovers it EXACTLY once the pool is wide enough.

    The driver's synthetic embeddings are distance-concentrated (the
    10th and 100th neighbor differ by < 25% in squared distance), the
    adversarial regime for any quantizer — measured here, the true
    top-10 spreads to ADC rank ≤ ~150 of 500. That is precisely why
    ``pq_topk_refined`` exists: a modest rerank pool + exact re-rank
    restores exactness while the corpus-wide scan stays codes-only."""
    rows = emb.collect()
    ids = np.asarray([r["vec_id"] for r in rows])
    X = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    q = np.asarray(qvec)
    exact_order = np.lexsort((ids, ((X - q) ** 2).sum(axis=1)))
    exact10 = set(ids[exact_order[:10]].tolist())

    codes = pq_encode(emb, books)
    adc10 = {r["vec_id"] for r in pq_topk(codes, qvec, books, k=10).collect()}
    assert len(adc10 & exact10) >= 3  # concentrated distances: coarse codes

    refined = pq_topk_refined(codes, emb, qvec, books, k=10, rerank=200).collect()
    assert {r["vec_id"] for r in refined} == exact10
    # refined distances are the true distances, ascending
    dists = [r["dist"] for r in refined]
    assert dists == sorted(dists)


def test_materialize_pq_roundtrip(spark, emb, books, tmp_path):
    path = str(tmp_path / "pq")
    materialize_pq(emb, books, path)
    codes = spark.read.parquet(f"{path}/codes")
    assert codes.count() == emb.count()
    assert "codes" in codes.columns and "embedding" not in codes.columns
    cb = spark.read.parquet(f"{path}/codebooks")
    assert cb.count() == 8 * 32
    # stored codebooks reproduce the in-memory ones
    stored = {
        (r["subspace"], r["centroid_id"]): list(r["centroid"]) for r in cb.collect()
    }
    for j in range(8):
        for c in range(32):
            assert stored[(j, c)] == pytest.approx(books[j][c])


def test_ivfpq_topk_partition_pruning_and_recall(spark, emb, books, qvec, tmp_path):
    """IVF×PQ over a materialized cell-partitioned index: the cell
    filter must be a PartitionFilter (pruning, not scan-and-discard),
    and the composed search must recover the query vector itself plus
    most of what brute force finds within the probed cells."""
    from mwas_rfam_spark.operators.quantization import ivfpq_topk
    from mwas_rfam_spark.operators.similarity import (
        train_ivf_centroids,
        write_ivf_index,
    )

    cents = train_ivf_centroids(emb, k=8, iters=2)
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, cents, path)
    out = ivfpq_topk(
        spark, path, books, cents, qvec, k=10, nprobe=3, rerank=100
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(cell" in plan or "cell#" in plan.split(
        "PartitionFilters"
    )[1][:200]
    rows = out.collect()
    assert len(rows) == 10
    # query vector is vec_id 0 (qvec fixture) — its own cell is always
    # the nearest probe, so it must come back at distance ~0
    assert rows[0]["dist"] == pytest.approx(0.0, abs=1e-9)
    dists = [r["dist"] for r in rows]
    assert dists == sorted(dists)


def test_encode_plan_is_single_projection(emb, books):
    """The corpus-scale encode pass must be a shuffle-free projection."""
    plan = pq_encode(emb, books)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ----------------------------------------------------------------- SQ8


def test_sq8_encode_decode_bounds_and_numpy_parity(spark):
    """SQ8 contract: per-dim decode error <= range/510; sq_topk is
    EXACT cosine over the decoded corpus (numpy replica, including the
    folded-query constant and the carried norm)."""
    import numpy as np

    from mwas_rfam_spark.operators.quantization import (
        sq_encode,
        sq_topk,
        train_sq_params,
    )

    rng = np.random.default_rng(8)
    X = rng.standard_normal((120, 10)) * np.linspace(0.5, 4.0, 10)
    emb = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    params = train_sq_params(emb)
    np.testing.assert_allclose(params["min"], X.min(axis=0), atol=1e-12)
    np.testing.assert_allclose(params["max"], X.max(axis=0), atol=1e-12)

    codes_df = sq_encode(emb, params)
    rows = {r["id"]: (np.asarray(r["codes"]), r["nrm"]) for r in codes_df.collect()}
    lo = np.asarray(params["min"])
    scale = (np.asarray(params["max"]) - lo) / 255.0
    for i, row in enumerate(X):
        codes, nrm = rows[i]
        assert codes.min() >= 0 and codes.max() <= 255
        decoded = codes * scale + lo
        assert np.abs(decoded - row).max() <= (scale * 255 / 510 + 1e-9).max()
        assert abs(nrm - np.linalg.norm(decoded)) < 1e-9

    q = X[3].tolist()
    got = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in sq_topk(codes_df, q, params, k=10).collect()
    ]
    dec = np.stack([rows[i][0] * scale + lo for i in range(len(X))])
    cos = (dec @ np.asarray(q)) / (
        np.linalg.norm(dec, axis=1) * np.linalg.norm(q)
    )
    want_order = sorted(range(len(X)), key=lambda i: (-round(cos[i], 12), i))[:10]
    want = [(i, round(float(cos[i]), 9)) for i in want_order]
    assert got == want


def test_sq8_recall_and_refined_on_real_embeddings(spark, sf_dir):
    """On the real embeddings table: codes-only top-k recalls most of
    the exact top-k (quantization error is small at 8 bits), and the
    refined two-stage search returns the EXACT top-k whenever the true
    top-k survives the candidate pool — pinned by comparing against
    brute force."""
    import numpy as np

    from mwas_rfam_spark.operators.quantization import (
        sq_encode,
        sq_topk_refined,
        train_sq_params,
    )
    from mwas_rfam_spark.operators.similarity import brute_force_topk
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    params = train_sq_params(emb)
    codes_df = sq_encode(emb, params).localCheckpoint()
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]

    exact = [
        (r["vec_id"], round(r["cosine"], 6))
        for r in brute_force_topk(emb, q, k=10).collect()
    ]
    refined = [
        (r["vec_id"], round(r["cosine"], 6))
        for r in sq_topk_refined(emb, codes_df, q, params, k=10, rerank=50).collect()
    ]
    assert refined == exact  # rerank=50 pool recovered the true top-10

    from mwas_rfam_spark.operators.quantization import sq_topk

    approx = {r["vec_id"] for r in sq_topk(codes_df, q, params, k=10).collect()}
    assert len(approx & {v for v, _ in exact}) >= 8


def test_sq8_duckdb_parity(spark, sf_dir):
    """Cross-engine: encode arithmetic (round-half-up, clamp) and the
    folded-query scoring replay in DuckDB over the same parquet."""
    import duckdb
    import numpy as np

    from mwas_rfam_spark.operators.quantization import (
        sq_encode,
        sq_topk,
        train_sq_params,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    params = train_sq_params(emb)
    codes_df = sq_encode(emb, params).localCheckpoint()
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    got = [
        (r["vec_id"], round(r["cosine"], 6))
        for r in sq_topk(codes_df, q, params, k=15).collect()
    ]

    lo = params["min"]
    rng_ = [params["max"][i] - lo[i] for i in range(len(lo))]
    const = sum(qi * m for qi, m in zip(q, lo))
    pre = [qi * r / 255.0 for qi, r in zip(q, rng_)]
    qn = float(np.linalg.norm(q))

    def arr(vals):
        return "CAST([" + ", ".join(repr(float(x)) for x in vals) + "] AS DOUBLE[])"

    con = duckdb.connect()
    want = [
        (r[0], r[1])
        for r in con.execute(f"""
        WITH c AS (
          SELECT vec_id,
                 list_transform(
                   list_zip(CAST(embedding AS DOUBLE[]), {arr(lo)}, {arr([255.0/r if r > 0 else 0.0 for r in rng_])}),
                   t -> least(255, greatest(0, CAST(round((t[1] - t[2]) * t[3], 0) AS INT)))
                 ) AS codes
          FROM read_parquet('{sf_dir}/embeddings.parquet')),
        scored AS (
          SELECT vec_id,
                 {repr(const)} + list_inner_product(
                   list_transform(codes, x -> CAST(x AS DOUBLE)), {arr(pre)}) AS dot,
                 sqrt(list_inner_product(
                   list_transform(list_zip(codes, {arr([r/255.0 for r in rng_])}, {arr(lo)}),
                                  t -> CAST(t[1] AS DOUBLE) * t[2] + t[3]),
                   list_transform(list_zip(codes, {arr([r/255.0 for r in rng_])}, {arr(lo)}),
                                  t -> CAST(t[1] AS DOUBLE) * t[2] + t[3]))) AS nrm
          FROM c)
        SELECT vec_id, round(dot / (nrm * {repr(qn)}), 6) AS cosine
        FROM scored ORDER BY dot / (nrm * {repr(qn)}) DESC, vec_id LIMIT 15
        """).fetchall()
    ]
    con.close()
    assert got == want and len(got) == 15


def test_sq8_zero_norm_vector_is_null_ranked_last(spark):
    """A zero-norm decoded vector (all-minima codes — realistic for
    non-negative embeddings) must not abort the query under ANSI mode:
    its cosine is NULL and ranks last."""
    from mwas_rfam_spark.operators.quantization import (
        sq_encode,
        sq_topk,
        train_sq_params,
    )

    emb = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 2.0]), (2, [3.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    params = train_sq_params(emb)
    got = sq_topk(sq_encode(emb, params), [1.0, 1.0], params, k=3).collect()
    assert [r["vec_id"] for r in got][-1] == 0
    assert got[-1]["cosine"] is None
    assert all(r["cosine"] is not None for r in got[:-1])


# ------------------------------------------------- materialized IVF-PQ


@pytest.fixture(scope="module")
def ivf_cents(emb):
    from mwas_rfam_spark.operators.similarity import train_ivf_centroids

    return train_ivf_centroids(emb, k=8, iters=2)


def _search(spark, path, qvec, **kw):
    from mwas_rfam_spark.operators.quantization import ivfpq_topk_indexed

    return [
        (r["vec_id"], round(r["dist"], 9))
        for r in ivfpq_topk_indexed(spark, path, qvec, **kw).collect()
    ]


def test_ivfpq_indexed_equals_on_the_fly(spark, emb, books, ivf_cents, qvec, tmp_path):
    """Self-contained materialized search == the encode-per-query path
    with the same quantizers, row for row; the codes scan must be
    partition-pruned (PartitionFilters on cell, not scan-and-discard)."""
    from mwas_rfam_spark.operators.quantization import (
        ivfpq_topk,
        ivfpq_topk_indexed,
        materialize_ivfpq,
    )
    from mwas_rfam_spark.operators.similarity import write_ivf_index

    path = str(tmp_path / "ivfpq")
    materialize_ivfpq(emb, ivf_cents, books, path)
    got = ivfpq_topk_indexed(spark, path, qvec, k=10, nprobe=3, rerank=100)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("PartitionFilters: [cell") >= 1 or plan.count(
        "PartitionFilters: [isnotnull(cell"
    ) >= 1

    flat = str(tmp_path / "flat_ivf")
    write_ivf_index(emb, ivf_cents, flat)
    want = ivfpq_topk(spark, flat, books, ivf_cents, qvec, k=10, nprobe=3, rerank=100)
    assert [(r["vec_id"], round(r["dist"], 9)) for r in got.collect()] == [
        (r["vec_id"], round(r["dist"], 9)) for r in want.collect()
    ]


def test_ivfpq_append_equals_rebuild(spark, emb, books, ivf_cents, qvec, tmp_path):
    from mwas_rfam_spark.operators.quantization import (
        append_ivfpq_index,
        materialize_ivfpq,
    )

    a = emb.where(F.col("vec_id") % 3 != 0)
    b = emb.where(F.col("vec_id") % 3 == 0)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    materialize_ivfpq(a, ivf_cents, books, inc)
    append_ivfpq_index(b, inc)
    materialize_ivfpq(emb, ivf_cents, books, full)
    kw = dict(k=12, nprobe=4, rerank=80)
    assert _search(spark, inc, qvec, **kw) == _search(spark, full, qvec, **kw)
    # the codes side must be identical as a relation, not just search-equal
    inc_codes = {
        (r["vec_id"], tuple(r["codes"]), r["cell"])
        for r in spark.read.parquet(f"{inc}/codes").collect()
    }
    full_codes = {
        (r["vec_id"], tuple(r["codes"]), r["cell"])
        for r in spark.read.parquet(f"{full}/codes").collect()
    }
    assert inc_codes == full_codes


def test_ivfpq_remove_equals_rebuild_and_empties_cells(
    spark, emb, books, ivf_cents, qvec, tmp_path
):
    from mwas_rfam_spark.operators.quantization import (
        materialize_ivfpq,
        remove_from_ivfpq_index,
    )
    from mwas_rfam_spark.operators.similarity import assign_ivf_cells

    # remove every vector of ONE whole cell plus a scattering of others,
    # so the emptied-directory delete path is exercised on both sides
    assigned = assign_ivf_cells(emb, ivf_cents)
    target_cell = int(assigned.groupBy("cell").count().orderBy("count").first()["cell"])
    gone = emb.join(
        assigned.where(
            (F.col("cell") == target_cell) | (F.col("vec_id") % 7 == 1)
        ).select("vec_id"),
        "vec_id",
    )
    keep = emb.join(gone.select("vec_id"), "vec_id", "left_anti")

    inc, ref = str(tmp_path / "inc"), str(tmp_path / "ref")
    materialize_ivfpq(emb, ivf_cents, books, inc)
    remove_from_ivfpq_index(gone, inc)
    materialize_ivfpq(keep, ivf_cents, books, ref)
    kw = dict(k=10, nprobe=8, rerank=200)
    assert _search(spark, inc, qvec, **kw) == _search(spark, ref, qvec, **kw)
    import os

    for side in ("vectors", "codes"):
        assert not os.path.exists(f"{inc}/{side}/cell={target_cell}")
        live = {
            int(r["cell"])
            for r in spark.read.parquet(f"{inc}/{side}").select("cell").distinct().collect()
        }
        assert target_cell not in live


def test_ivfpq_compact_preserves_search(spark, emb, books, ivf_cents, qvec, tmp_path):
    from mwas_rfam_spark.operators.quantization import (
        append_ivfpq_index,
        compact_ivfpq_index,
        materialize_ivfpq,
    )

    path = str(tmp_path / "ivfpq")
    parts = [emb.where(F.col("vec_id") % 4 == i) for i in range(4)]
    materialize_ivfpq(parts[0], ivf_cents, books, path)
    for p in parts[1:]:
        append_ivfpq_index(p, path)
    kw = dict(k=10, nprobe=3, rerank=100)
    before = _search(spark, path, qvec, **kw)
    import glob

    files_before = len(glob.glob(f"{path}/*/cell=*/*.parquet"))
    n_after = compact_ivfpq_index(spark, path)
    assert _search(spark, path, qvec, **kw) == before
    assert n_after < files_before


def test_ivfpq_knn_join_single_query_equivalence(spark, emb, books, ivf_cents, qvec, tmp_path):
    """For each query row, the batch codes-scan join returns exactly the
    single-query ivfpq_topk_indexed rows (same ADC LUT floats, same
    rerank); nprobe guard enforced; NULL query vectors vanish."""
    from mwas_rfam_spark.operators.quantization import (
        ivfpq_knn_join,
        ivfpq_topk_indexed,
        materialize_ivfpq,
    )

    path = str(tmp_path / "ivfpq")
    materialize_ivfpq(emb, ivf_cents, books, path)
    q = emb.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    q = q.unionByName(
        spark.createDataFrame([(99, None)], "q_id long, q_vec array<float>")
    )
    out = ivfpq_knn_join(spark, path, q, k=5, nprobe=3, rerank=100)
    # BOTH corpus-side scans must be statically partition-pruned to the
    # probed-cell union (dynamic pruning does not fire for a broadcast
    # mapInPandas side)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("PartitionFilters: [cell") >= 2 or (
        plan.count("cell#") >= 2 and plan.count(" IN (") >= 2
    )
    rows = out.collect()
    assert {r["q_id"] for r in rows} == {0, 1, 2}  # NULL query vanished
    for qid in (0, 1, 2):
        qv = [float(x) for x in emb.where(F.col("vec_id") == qid).first()["embedding"]]
        single = [
            (r["vec_id"], round(r["dist"], 9))
            for r in ivfpq_topk_indexed(
                spark, path, qv, k=5, nprobe=3, rerank=100
            ).collect()
        ]
        batch = [
            (r["vec_id"], round(r["dist"], 9))
            for r in sorted(
                (r for r in rows if r["q_id"] == qid), key=lambda r: r["rank"]
            )
        ]
        assert single == batch

    import pytest as _pytest

    with _pytest.raises(ValueError, match="nprobe"):
        ivfpq_knn_join(spark, path, q, k=5, nprobe=0)
    with _pytest.raises(ValueError, match="rerank"):
        ivfpq_knn_join(spark, path, q, k=10, rerank=5)
    dup = q.where("q_id = 0").unionByName(q.where("q_id = 0"))
    with _pytest.raises(ValueError, match="duplicate q_id"):
        ivfpq_knn_join(spark, path, dup, k=5, nprobe=3, rerank=100)


def test_opq_rotation_reduces_quantization_error(spark):
    """OPQ (Ge et al. CVPR'13): on correlated data whose variance
    crosses subspace boundaries, the learned orthogonal rotation must
    cut PQ reconstruction error vs the identity split at the same code
    budget; R must be orthogonal; and because R preserves geometry,
    exact search over rotated vectors returns identical ids."""
    import numpy as np

    from mwas_rfam_spark.operators.decomposition import project_embeddings
    from mwas_rfam_spark.operators.quantization import (
        pq_encode,
        train_opq,
        train_pq_codebooks,
    )
    from mwas_rfam_spark.operators.similarity import brute_force_topk

    rng = np.random.default_rng(11)
    d, n = 16, 600
    # correlated: a random linear mix of 4 latent factors + small noise
    A = rng.standard_normal((d, 4))
    X = rng.standard_normal((n, 4)) @ A.T + 0.05 * rng.standard_normal((n, d))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()

    opq = train_opq(emb, m=4, k=16, opq_iters=3, sample_size=n)
    R = np.asarray(opq["rotation"])
    assert np.allclose(R @ R.T, np.eye(d), atol=1e-9)  # orthogonal

    def recon_mse(vectors, books):
        C = [np.asarray(b) for b in books]
        d0 = C[0].shape[1]
        err = 0.0
        for v in vectors:
            for j in range(len(C)):
                sub = v[j * d0 : (j + 1) * d0]
                dist = ((C[j] - sub[None, :]) ** 2).sum(axis=1)
                err += dist.min()
        return err / len(vectors)

    plain_books = train_pq_codebooks(emb, m=4, k=16, sample_size=n)
    mse_plain = recon_mse(X, plain_books)
    mse_opq = recon_mse(X @ R.T, opq["codebooks"])
    assert mse_opq < mse_plain * 0.9  # a real win, not noise

    # geometry preserved: exact top-k over rotated == over raw
    rotated = project_embeddings(emb, opq["rotation"]).cache()
    q = [float(x) for x in X[0]]
    qr = [float(x) for x in (np.asarray(q) @ R.T)]
    raw_ids = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    rot_ids = [r["vec_id"] for r in brute_force_topk(rotated, qr, k=10).collect()]
    assert raw_ids == rot_ids

    # composes with pq_encode (codes valid, deterministic)
    codes = pq_encode(rotated, opq["codebooks"]).collect()
    assert len(codes) == n and all(len(r["codes"]) == 4 for r in codes)

    # determinism: same corpus -> same rotation bit for bit
    again = train_opq(emb, m=4, k=16, opq_iters=3, sample_size=n)
    assert again["rotation"] == opq["rotation"]

    import pytest as _pt

    with _pt.raises(ValueError, match="divisible"):
        train_opq(emb, m=5)
    with _pt.raises(ValueError, match="opq_iters"):
        train_opq(emb, m=4, opq_iters=0)


def test_ivfpq_residual_encoding(spark, emb, books, ivf_cents, qvec, tmp_path):
    """Residual IVF-PQ (the faiss default): codes encode x − centroid,
    so the codebooks only cover within-cell spread. Pins: (1) the meta
    flag is self-describing and a legacy index (no meta) reads as raw;
    (2) residual ADC approximates true distances strictly better than
    raw ADC on the same corpus/codebooks; (3) search with re-rank stays
    exact within probed cells; (4) append == rebuild under the stored
    residual flag; (5) the batch k-NN join's single-query slice equals
    the single-query search."""
    from mwas_rfam_spark.operators.quantization import (
        ivfpq_knn_join,
        ivfpq_topk_indexed,
        materialize_ivfpq,
        pq_adc_scores,
        _index_is_residual,
    )
    from mwas_rfam_spark.operators.similarity import assign_ivf_cells

    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    raw_path = str(tmp_path / "raw")
    res_path = str(tmp_path / "res")
    res_books = train_pq_codebooks(
        emb, m=8, k=32, iters=5, sample_size=512, residual_centroids=ivf_cents
    )
    materialize_ivfpq(e, ivf_cents, books, raw_path)
    materialize_ivfpq(e, ivf_cents, res_books, res_path, residual=True)
    assert _index_is_residual(spark, res_path) is True
    assert _index_is_residual(spark, raw_path) is False

    # (1) legacy layout: delete the meta dir -> raw semantics
    import shutil

    legacy = str(tmp_path / "legacy")
    shutil.copytree(raw_path, legacy)
    shutil.rmtree(f"{legacy}/meta")
    assert _index_is_residual(spark, legacy) is False

    # (1b) a meta that EXISTS but lacks the residual column is an
    # unknown layout, not legacy — refuse rather than guess raw
    # (r8 ADVICE: a silent raw guess returns wrong ADC candidates)
    import pytest

    anomalous = str(tmp_path / "anomalous")
    shutil.copytree(raw_path, anomalous)
    shutil.rmtree(f"{anomalous}/meta")
    spark.createDataFrame([(False,)], "building BOOLEAN").coalesce(
        1
    ).write.parquet(f"{anomalous}/meta")
    with pytest.raises(ValueError, match="no 'residual' column"):
        _index_is_residual(spark, anomalous)

    # (2) residual ADC error < raw ADC error (same books, clustered data)
    import numpy as np

    q = np.asarray(qvec)
    assigned = assign_ivf_cells(e, ivf_cents).localCheckpoint()
    true_d = {
        r["vec_id"]: float(np.sum((np.asarray(r["embedding"]) - q) ** 2))
        for r in assigned.collect()
    }

    def adc_err(path, bks):
        codes = spark.read.parquet(f"{path}/codes")
        resid = _index_is_residual(spark, path)
        total, n = 0.0, 0
        for cell in range(len(ivf_cents)):
            part = codes.where(F.col("cell") == cell)
            qq = q - np.asarray(ivf_cents[cell]) if resid else q
            for r in pq_adc_scores(part, [float(x) for x in qq], bks).collect():
                total += abs(r["approx_dist"] - true_d[r["vec_id"]])
                n += 1
        return total / n

    # strictly better on the sf embeddings; the MAGNITUDE of the win
    # scales with how much structure the coarse quantizer captures
    # (8 cells over 500 vectors: ~6% here; probe O measures the
    # clone-heavy corpus where mistrained books explode 15x instead)
    assert adc_err(res_path, res_books) < adc_err(raw_path, books) * 0.99

    # (3) exactness with a generous re-rank: residual search == raw
    # search == exact within the SAME probed cells
    got_res = [
        (r["vec_id"], round(r["dist"], 9))
        for r in ivfpq_topk_indexed(spark, res_path, qvec, k=10, nprobe=8, rerank=500).collect()
    ]
    got_raw = [
        (r["vec_id"], round(r["dist"], 9))
        for r in ivfpq_topk_indexed(spark, raw_path, qvec, k=10, nprobe=8, rerank=500).collect()
    ]
    assert got_res == got_raw and len(got_res) == 10

    # (4) append == rebuild, honoring the stored residual flag
    inc = str(tmp_path / "inc")
    half_a = e.where(F.col("vec_id") % 2 == 0)
    half_b = e.where(F.col("vec_id") % 2 == 1)
    materialize_ivfpq(half_a, ivf_cents, res_books, inc, residual=True)
    from mwas_rfam_spark.operators.quantization import append_ivfpq_index

    append_ivfpq_index(half_b, inc)
    want = [
        (r["vec_id"], round(r["dist"], 9))
        for r in ivfpq_topk_indexed(spark, res_path, qvec, k=10, nprobe=3, rerank=60).collect()
    ]
    got = [
        (r["vec_id"], round(r["dist"], 9))
        for r in ivfpq_topk_indexed(spark, inc, qvec, k=10, nprobe=3, rerank=60).collect()
    ]
    assert got == want

    # (5) batch join, single-query slice == single-query search
    queries = spark.createDataFrame(
        [(0, qvec)], "q_id long, q_vec array<double>"
    )
    jn = [
        (r["vec_id"], round(r["dist"], 9))
        for r in ivfpq_knn_join(spark, res_path, queries, k=10, nprobe=3, rerank=60)
        .orderBy("rank")
        .collect()
    ]
    single = [
        (r["vec_id"], round(r["dist"], 9))
        for r in ivfpq_topk_indexed(spark, res_path, qvec, k=10, nprobe=3, rerank=60).collect()
    ]
    assert jn == single


def test_ivfpq_interrupted_build_refused(spark, emb, books, ivf_cents, tmp_path):
    """Review regression: an in-place rebuild is not atomic, so probes
    must REFUSE an index whose meta still says building (codes and
    encoding flag may disagree) instead of silently guessing raw."""
    from mwas_rfam_spark.operators.quantization import (
        _index_is_residual,
        ivfpq_topk_indexed,
        materialize_ivfpq,
    )

    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    p = str(tmp_path / "idx")
    materialize_ivfpq(e, ivf_cents, books, p, residual=True)
    assert _index_is_residual(spark, p) is True
    # simulate a crash mid-rebuild: rewrite meta to building=True
    spark.createDataFrame(
        [(False, True)], "residual boolean, building boolean"
    ).coalesce(1).write.mode("overwrite").parquet(f"{p}/meta")
    with pytest.raises(ValueError, match="interrupted"):
        _index_is_residual(spark, p)
    q = [float(x) for x in e.orderBy("vec_id").first()["embedding"]]
    with pytest.raises(ValueError, match="interrupted"):
        ivfpq_topk_indexed(spark, p, q, k=5).collect()
    with pytest.raises(ValueError, match="nprobe"):
        # validated before any IO-path divergence between encodings
        materialize_ivfpq(e, ivf_cents, books, p)  # repair first
        ivfpq_topk_indexed(spark, p, q, k=5, nprobe=0)


def test_opq_returned_pair_is_self_consistent(spark):
    """r11 review finding: train_opq used to return codebooks trained
    under the PREVIOUS rotation (the Procrustes step advances R once
    more after training). The returned pair must be exactly what
    retraining in the returned rotated space produces — the trainer is
    deterministic, so this is an equality pin, and it holds at
    opq_iters=1 where the old code returned raw-trained books with a
    non-identity rotation."""
    import numpy as np

    from mwas_rfam_spark.operators.decomposition import project_embeddings
    from mwas_rfam_spark.operators.quantization import (
        train_opq,
        train_pq_codebooks,
    )

    rng = np.random.default_rng(11)
    n, d = 160, 8
    base = rng.normal(size=(n, 2))
    mix = rng.normal(size=(2, d))
    X = base @ mix + 0.05 * rng.normal(size=(n, d))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).cache()

    for iters in (1, 3):
        opq = train_opq(emb, m=4, k=8, opq_iters=iters, sample_size=n)
        R = np.asarray(opq["rotation"])
        assert not np.allclose(R, np.eye(d))  # the rotation is real
        rotated = project_embeddings(emb, opq["rotation"])
        retrained = train_pq_codebooks(rotated, m=4, k=8, sample_size=n)
        assert retrained == opq["codebooks"]


def test_pq_query_dim_validated_and_nulls_last(spark):
    """r11 review finding: a query longer than m*d0 was silently
    truncated by the ADC table and the exact re-rank then ranked
    all-NULL distances FIRST. Every ADC path now raises by name."""
    import pytest as _pt

    from mwas_rfam_spark.operators.quantization import (
        adc_lookup_table,
        pq_encode,
        pq_topk,
        pq_topk_refined,
        train_pq_codebooks,
    )

    emb = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 1.0, 0.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    ).cache()
    books = train_pq_codebooks(emb, m=2, k=4, sample_size=40)
    codes = pq_encode(emb, books).cache()
    for bad_q in ([1.0] * 8, [1.0] * 3):
        with _pt.raises(ValueError, match="query dimension"):
            adc_lookup_table(bad_q, books)
        with _pt.raises(ValueError, match="query dimension"):
            pq_topk(codes, bad_q, books, k=3)
        with _pt.raises(ValueError, match="query dimension"):
            pq_topk_refined(codes, emb, bad_q, books, k=3).collect()


def test_pq_trainer_null_and_empty_guards(spark):
    import pytest as _pt

    from mwas_rfam_spark.operators.quantization import train_pq_codebooks

    mixed = spark.createDataFrame(
        [(0, None), (1, [1.0, 2.0]), (2, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    books = train_pq_codebooks(mixed, m=2, k=2, sample_size=10)
    assert len(books) == 2  # NULL row filtered, not a TypeError
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with _pt.raises(ValueError, match="non-empty"):
        train_pq_codebooks(empty, m=2, k=2)


def test_ivfpq_building_sentinel_refuses_torn_states(spark, tmp_path):
    """r11 review findings: (a) a crash inside a meta rewrite deletes
    the meta dir, and the missing-meta legacy fallback would silently
    demote a residual index to raw — the _building sentinel survives
    the rewrite and makes probes refuse instead; (b) an append against
    a refusing index must raise BEFORE writing its vectors side."""
    import glob

    import numpy as np
    import pytest as _pt

    from mwas_rfam_spark.operators.quantization import (
        append_ivfpq_index,
        ivfpq_topk_indexed,
        materialize_ivfpq,
        train_pq_codebooks,
    )
    from mwas_rfam_spark.operators.similarity import train_ivf_centroids

    rng = np.random.default_rng(7)
    X = rng.normal(size=(80, 4))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(80)],
        "vec_id long, embedding array<double>",
    ).cache()
    cents = train_ivf_centroids(emb, k=4)
    books = train_pq_codebooks(emb, m=2, k=8, residual_centroids=cents)
    path = str(tmp_path / "ivfpq")
    materialize_ivfpq(emb, cents, books, path, residual=True)
    assert ivfpq_topk_indexed(spark, path, [0.0] * 4, k=3).count() == 3
    assert not (tmp_path / "ivfpq" / "_building").exists()  # cleared

    # simulate the crash window: sentinel present, meta dir GONE
    import shutil

    shutil.rmtree(f"{path}/meta")
    (tmp_path / "ivfpq" / "_building").touch()
    with _pt.raises(ValueError, match="interrupted"):
        ivfpq_topk_indexed(spark, path, [0.0] * 4, k=3)

    # an append against the refusing index raises BEFORE its first
    # write — the vectors side must be untouched
    before = set(glob.glob(f"{path}/vectors/**/*.parquet", recursive=True))
    new = spark.createDataFrame(
        [(100 + i, [float(x) for x in rng.normal(size=4)]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    with _pt.raises(ValueError, match="interrupted"):
        append_ivfpq_index(new, path)
    after = set(glob.glob(f"{path}/vectors/**/*.parquet", recursive=True))
    assert after == before

    # a completed rebuild converges: sentinel cleared, residual honored
    materialize_ivfpq(emb, cents, books, path, residual=True)
    assert not (tmp_path / "ivfpq" / "_building").exists()
    got = ivfpq_topk_indexed(spark, path, [float(x) for x in X[3]], k=1)
    assert got.collect()[0]["vec_id"] == 3
