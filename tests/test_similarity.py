"""Similarity-search operator tests: exact k-NN ranking, IVF quantizer
determinism and recall, sink round-trips."""

import pytest
from pyspark.sql import functions as F

from mwas_rfam_spark.operators.similarity import (
    assign_ivf_cells,
    brute_force_topk,
    ivf_ann_topk,
    knn_per_query,
    train_ivf_centroids,
)

VECS = [
    (0, [1.0, 0.0, 0.0], 0),
    (1, [0.9, 0.1, 0.0], 0),
    (2, [0.0, 1.0, 0.0], 1),
    (3, [0.1, 0.9, 0.0], 1),
    (4, [0.0, 0.0, 1.0], 2),
    (5, [0.0, 0.1, 0.9], 2),
]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(VECS, ["vec_id", "embedding", "label"]).cache()


def test_brute_force_topk_exact(emb):
    top = brute_force_topk(emb, [1.0, 0.0, 0.0], k=2).collect()
    assert [r["vec_id"] for r in top] == [0, 1]
    assert top[0]["cosine"] == pytest.approx(1.0)


def test_knn_per_query_ranks(emb):
    qs = emb.limit(2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = knn_per_query(emb, qs, k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append((r["rank"], r["vec_id"]))
    # each query's rank-1 neighbor is itself (cosine 1.0)
    for q_id, pairs in by_q.items():
        assert sorted(pairs)[0] == (1, q_id)
        assert len(pairs) == 2


def test_ivf_cells_and_determinism(emb):
    c1 = train_ivf_centroids(emb, k=3, iters=2)
    c2 = train_ivf_centroids(emb, k=3, iters=2)
    assert c1 == c2  # seeded init + deterministic passes
    cells = assign_ivf_cells(emb, c1).collect()
    assert all(0 <= r["cell"] < 3 for r in cells)
    # co-directional vectors land in the same cell
    by_id = {r["vec_id"]: r["cell"] for r in cells}
    assert by_id[0] == by_id[1] and by_id[2] == by_id[3] and by_id[4] == by_id[5]


def test_ivf_topk_finds_query_vector(emb):
    cents = train_ivf_centroids(emb, k=3, iters=2)
    top = ivf_ann_topk(emb, [0.9, 0.1, 0.0], cents, k=2, nprobe=1).collect()
    assert top[0]["vec_id"] == 1 and top[0]["cosine"] == pytest.approx(1.0)


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.orderBy("vec_id").select("embedding").first()["embedding"]
    qv = [float(x) for x in q]
    exact = {r["vec_id"] for r in brute_force_topk(e, qv, k=10).collect()}
    cents = train_ivf_centroids(e, k=8, iters=2)
    approx = {r["vec_id"] for r in ivf_ann_topk(e, qv, cents, k=10, nprobe=3).collect()}
    # probing 3/8 cells must still recover a meaningful share of the
    # exact top-10 (and always the query vector itself)
    assert len(exact & approx) >= 5


def test_result_sinks_round_trip(spark, tmp_path):
    from mwas_rfam_spark.sources.sinks import (
        write_results_combined,
        write_results_partitioned,
    )

    df = spark.createDataFrame(
        [("P1", "a", 1.0), ("P1", "b", 2.0), ("P2", "c", 3.0)],
        ["bioproject", "k", "v"],
    )
    p1 = str(tmp_path / "part")
    write_results_partitioned(df, p1)
    back = spark.read.parquet(p1)
    assert back.count() == 3
    assert set(back.select("bioproject").distinct().toPandas()["bioproject"]) == {"P1", "P2"}
    import os
    assert any(d.startswith("bioproject=") for d in os.listdir(p1))

    p2 = str(tmp_path / "comb")
    write_results_combined(df, p2)
    csv = spark.read.option("header", True).csv(p2)
    assert csv.count() == 3 and set(csv.columns) == {"bioproject", "k", "v"}


def test_lsh_multiprobe_improves_recall(spark, sf_dir):
    """Multi-probe LSH (Lv et al. VLDB'07): probing the flipped-low-margin
    buckets must recall at least as much as the single query bucket, and
    must reach the floor the ann_recall relation pins."""
    import numpy as np

    from mwas_rfam_spark.operators.similarity import brute_force_topk, lsh_ann_topk

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    qvec = [
        float(x)
        for x in e.orderBy("vec_id").select("embedding").limit(1).collect()[0]["embedding"]
    ]
    exact = {r["vec_id"] for r in brute_force_topk(e, qvec, k=10).collect()}
    planes = np.random.default_rng(42).standard_normal((6, len(qvec))).tolist()
    one = {r["vec_id"] for r in lsh_ann_topk(e, qvec, planes, k=10, n_probes=1).collect()}
    multi = {r["vec_id"] for r in lsh_ann_topk(e, qvec, planes, k=10, n_probes=16).collect()}
    assert len(multi & exact) >= len(one & exact)
    assert len(multi & exact) >= 4


def test_ivf_indexed_probe_prunes_partitions(spark, tmp_path):
    """The materialized IVF index must (a) return exactly the same top-k
    as the on-the-fly cell filter and (b) show the probe as
    PartitionFilters in the scan — pruning at planning time, not a
    compute-then-discard pass."""
    from mwas_rfam_spark.operators.similarity import (
        ivf_ann_topk,
        ivf_ann_topk_indexed,
        train_ivf_centroids,
        write_ivf_index,
    )

    rows = [
        (i, [float((i * 7 + d * 3) % 11) for d in range(4)]) for i in range(200)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_ivf_centroids(emb, k=4, iters=2)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, cents, path)

    qvec = rows[0][1]
    direct = ivf_ann_topk(emb, qvec, cents, k=5, nprobe=2).collect()
    indexed_df = ivf_ann_topk_indexed(spark, path, qvec, cents, k=5, nprobe=2)
    indexed = indexed_df.collect()
    assert [(r["vec_id"], round(r["cosine"], 9)) for r in direct] == [
        (r["vec_id"], round(r["cosine"], 9)) for r in indexed
    ]

    plan = indexed_df._sc._jvm.PythonSQLUtils.explainString(
        indexed_df._jdf.queryExecution(), "formatted"
    )
    pf = plan.split("PartitionFilters")[1][:120]
    assert "cell" in pf, pf


def test_assign_cells_arrow_matches_expression_path(spark):
    """The large-k GEMM kernel and the inline-expression path are the
    SAME operator (argmin of L2, ties to the lowest cell): identical
    assignments on a shared corpus, and the kernel handles k past the
    codegen cutover where the expression path would degrade."""
    import numpy as np

    from mwas_rfam_spark.operators.similarity import (
        IVF_ASSIGN_CODEGEN_MAX_CELLS,
        _assign_cells_arrow,
        assign_ivf_cells,
    )

    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(300)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [rng.standard_normal(8).tolist() for _ in range(7)]

    via_expr = {
        r["vec_id"]: r["cell"] for r in assign_ivf_cells(emb, cents).collect()
    }
    via_arrow = {
        r["vec_id"]: r["cell"]
        for r in _assign_cells_arrow(emb, cents, "embedding").collect()
    }
    assert via_expr == via_arrow

    # exact-tie determinism: equidistant centroids -> lowest cell id
    tie = spark.createDataFrame([(0, [0.0, 0.0])], "vec_id long, embedding array<double>")
    tie_cents = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]
    assert assign_ivf_cells(tie, tie_cents).first()["cell"] == 0
    assert _assign_cells_arrow(tie, tie_cents, "embedding").first()["cell"] == 0

    # past the cutover the dispatcher picks the kernel and stays correct
    big_k = IVF_ASSIGN_CODEGEN_MAX_CELLS + 10
    big_cents = [rng.standard_normal(8).tolist() for _ in range(big_k)]
    got = assign_ivf_cells(emb, big_cents).collect()
    C = np.asarray(big_cents)
    for r in got[:25]:
        x = np.asarray(r["embedding"])
        assert r["cell"] == int(np.argmin(((C - x) ** 2).sum(axis=1)))

    # NULL / wrong-dim vectors: both paths yield a NULL cell (the
    # kernel must not crash the task nor diverge from the expression
    # path's zip_with/aggregate NULL propagation)
    messy = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, [1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    for cents_m in (tie_cents, [list(r) for r in rng.standard_normal(
            (IVF_ASSIGN_CODEGEN_MAX_CELLS + 5, 2))]):
        cells = {r["vec_id"]: r["cell"] for r in assign_ivf_cells(messy, cents_m).collect()}
        assert cells[0] is not None
        assert cells[1] is None and cells[2] is None


def test_append_ivf_index_equals_full_rebuild(spark, sf_dir, tmp_path):
    """materialize(A) + append(B) probes identically to materialize(A∪B)
    under the SAME frozen centroids (cell assignment is a pure function
    of the stored quantizer)."""
    from pyspark.sql import functions as F

    from mwas_rfam_spark.operators.similarity import (
        append_ivf_index,
        ivf_ann_topk_indexed,
        materialize_ivf,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents = train_ivf_centroids(emb, k=8, iters=2)
    a = emb.where("vec_id % 4 != 0")
    b = emb.where("vec_id % 4 = 0")

    inc = str(tmp_path / "inc")
    materialize_ivf(a, cents, inc)
    append_ivf_index(b, inc)
    full = str(tmp_path / "full")
    materialize_ivf(emb, cents, full)

    q = [float(x) for x in emb.first()["embedding"]]
    got = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in ivf_ann_topk_indexed(
            spark, f"{inc}/vectors", q, cents, k=10, nprobe=4
        ).collect()
    ]
    want = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in ivf_ann_topk_indexed(
            spark, f"{full}/vectors", q, cents, k=10, nprobe=4
        ).collect()
    ]
    assert got == want and len(got) == 10

    # row-count identity across the partitioned files
    assert (
        spark.read.parquet(f"{inc}/vectors").count()
        == spark.read.parquet(f"{full}/vectors").count()
    )

    import pytest

    with pytest.raises(Exception, match="centroids"):
        append_ivf_index(b, str(tmp_path / "nowhere"))

    # --- compaction (r5 verdict task #7): more appends, then rewrite --
    from mwas_rfam_spark.operators.similarity import compact_ivf_index

    for m in range(3):
        append_ivf_index(
            b.select((F.col("vec_id") + 100_000 * (m + 1)).alias("vec_id"), "embedding"),
            inc,
        )
    probe_before = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in ivf_ann_topk_indexed(
            spark, f"{inc}/vectors", q, cents, k=10, nprobe=4
        ).collect()
    ]
    import glob

    files_before = len(glob.glob(f"{inc}/vectors/cell=*/part-*"))
    files_after = compact_ivf_index(spark, inc, target_rows_per_file=1 << 20)
    assert files_after == len(glob.glob(f"{inc}/vectors/cell=*/part-*")) < files_before
    assert files_after <= len(cents)  # one file per cell at this scale
    probe_after = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in ivf_ann_topk_indexed(
            spark, f"{inc}/vectors", q, cents, k=10, nprobe=4
        ).collect()
    ]
    assert probe_after == probe_before


def test_append_ivf_dimension_guard(spark, tmp_path):
    """Appending vectors of the wrong dimension must fail loud — a
    silent zip_with pad would strand them in the NULL cell partition
    where probes never look."""
    import pytest
    from pyspark.sql import functions as F

    from mwas_rfam_spark.operators.similarity import (
        append_ivf_index,
        materialize_ivf,
        train_ivf_centroids,
    )

    emb = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 1.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    cents = train_ivf_centroids(emb, k=2, iters=1)
    path = str(tmp_path / "idx")
    materialize_ivf(emb, cents, path)
    bad = spark.createDataFrame(
        [(100, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="dimension"):
        append_ivf_index(bad, path)


def test_remove_from_ivf_index_equals_rebuild(spark, sf_dir, tmp_path):
    """materialize(A ∪ B) − remove(B) probes identically to
    materialize(A) under the same frozen centroids; an emptied cell's
    directory is deleted."""
    from pyspark.sql import functions as F

    from mwas_rfam_spark.operators.similarity import (
        ivf_ann_topk_indexed,
        materialize_ivf,
        remove_from_ivf_index,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cents = train_ivf_centroids(emb, k=8, iters=1)
    keep = emb.where("vec_id % 4 != 0")
    gone = emb.where("vec_id % 4 = 0")

    inc = str(tmp_path / "inc")
    materialize_ivf(emb, cents, inc)
    remove_from_ivf_index(gone, inc)
    ref = str(tmp_path / "ref")
    materialize_ivf(keep, cents, ref)

    q = [float(x) for x in emb.first()["embedding"]]
    got = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in ivf_ann_topk_indexed(
            spark, f"{inc}/vectors", q, cents, k=10, nprobe=4
        ).collect()
    ]
    want = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in ivf_ann_topk_indexed(
            spark, f"{ref}/vectors", q, cents, k=10, nprobe=4
        ).collect()
    ]
    assert got == want and len(got) == 10
    assert (
        spark.read.parquet(f"{inc}/vectors").count()
        == spark.read.parquet(f"{ref}/vectors").count()
    )

    # empty an entire cell: remove EVERYTHING -> all touched dirs go
    import glob

    remove_from_ivf_index(keep, inc)
    assert glob.glob(f"{inc}/vectors/cell=*") == []


def test_ivf_knn_join_parity_and_probe_semantics(spark, sf_dir, tmp_path):
    """nprobe == k_cells probes everything and must reproduce the
    brute-force k-NN join exactly; small nprobe still finds each
    query's own vector (its cell is always the nearest probe); NULL /
    ragged query vectors probe nothing and vanish."""
    from mwas_rfam_spark.operators.similarity import (
        ivf_knn_join,
        knn_per_query,
        train_ivf_centroids,
    )

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .cache()
    )
    cents = train_ivf_centroids(emb, k=8, iters=2)
    d = len(cents[0])
    q_rows = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.orderBy("vec_id").limit(3).collect()
    ]
    queries = spark.createDataFrame(
        q_rows + [(99, None), (98, [1.0, 2.0])],
        "q_id long, q_vec array<double>",
    )

    key = lambda df: sorted(
        (r["q_id"], r["rank"], r["vec_id"], round(r["cosine"], 9))
        for r in df.collect()
    )
    exact = knn_per_query(emb, queries.where("q_vec is not null and size(q_vec) = %d" % d), k=5)
    everything = ivf_knn_join(emb, queries, cents, k=5, nprobe=len(cents))
    assert key(everything) == key(exact)

    pruned = ivf_knn_join(emb, queries, cents, k=5, nprobe=2)
    got = {
        (r["q_id"], r["vec_id"])
        for r in pruned.where("rank = 1").collect()
    }
    # each real query is a corpus vector: its own cell is the nearest
    # probe, so rank 1 is itself at cosine ~1
    assert got == {(q, q) for q, _ in q_rows}
    assert {r["q_id"] for r in pruned.collect()} == {q for q, _ in q_rows}

    # pre-assigned cell column is honored (no re-assignment)
    from mwas_rfam_spark.operators.similarity import assign_ivf_cells

    pre = assign_ivf_cells(emb, cents)
    again = ivf_knn_join(pre, queries, cents, k=5, nprobe=len(cents))
    assert key(again) == key(exact)


def test_similarity_degenerate_vector_guards(spark):
    """r11 review findings (confirmed live before fixing): a zero-norm
    vector used to abort every cosine path with ANSI DIVIDE_BY_ZERO;
    a NaN-element vector was silently filed into cell 0 by the Arrow
    assignment path (argmin of all-NaN = 0) while the expression path
    gave cell NULL; train_ivf_centroids crashed opaquely on NULL rows
    and empty input."""
    import pytest as _pt

    from mwas_rfam_spark.operators.similarity import (
        assign_ivf_cells,
        cosine_to_query,
        knn_per_query,
        train_ivf_centroids,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.6, 0.8]), (4, None)],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["cosine"] for r in cosine_to_query(emb, [1.0, 0.0]).collect()}
    assert got[1] == 1.0 and got[2] is None and got[4] is None

    queries = spark.createDataFrame(
        [(7, [1.0, 0.0])], "q_id long, q_vec array<double>"
    )
    rows = knn_per_query(emb, queries, k=4).collect()
    assert {r["vec_id"] for r in rows} <= {1, 2, 3, 4}
    # zero-norm query side too
    zq = spark.createDataFrame([(8, [0.0, 0.0])], "q_id long, q_vec array<double>")
    assert all(r["cosine"] is None for r in knn_per_query(emb, zq, k=2).collect())

    # Arrow-vs-expression cell parity on a NaN element: both NULL
    nan_emb = spark.createDataFrame(
        [(1, [1.0, float("nan")]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    for k in (2, 17):
        cents = [[float(i), float(i)] for i in range(k)]
        cells = {
            r["vec_id"]: r["cell"]
            for r in assign_ivf_cells(nan_emb, cents).collect()
        }
        assert cells[1] is None, f"k={k}: NaN vector must get NULL cell"
        assert cells[2] is not None

    # trainer guards: NULL rows filtered; Lloyd update survives them
    cents = train_ivf_centroids(emb, k=2, iters=2)
    assert len(cents) == 2
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with _pt.raises(ValueError, match="non-empty"):
        train_ivf_centroids(empty, k=2)


def test_ivf_knn_join_qid_validation_and_static_pruning(spark, tmp_path):
    """r11 review findings: duplicate q_ids silently merged two queries'
    candidates into one top-k (now refused by name, the ivfpq_knn_join
    contract); and a pre-assigned (index-read) corpus side now carries
    a STATIC probed-cell filter so partition pruning actually fires
    instead of scanning every cell's files."""
    import numpy as np
    import pytest as _pt

    from mwas_rfam_spark.operators.similarity import (
        ivf_knn_join,
        knn_per_query,
        train_ivf_centroids,
        write_ivf_index,
    )

    rng = np.random.default_rng(3)
    X = rng.normal(size=(60, 4))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    ).cache()
    cents = train_ivf_centroids(emb, k=4)

    dup_q = spark.createDataFrame(
        [(7, [1.0, 0.0, 0.0, 0.0]), (7, [0.0, 1.0, 0.0, 0.0])],
        "q_id long, q_vec array<double>",
    )
    with _pt.raises(ValueError, match="duplicate q_id"):
        ivf_knn_join(emb, dup_q, cents, k=3)
    with _pt.raises(ValueError, match="duplicate q_id"):
        knn_per_query(emb, dup_q, k=3)

    path = str(tmp_path / "ivf")
    write_ivf_index(emb, cents, f"{path}/vectors")
    stored = spark.read.parquet(f"{path}/vectors")
    queries = spark.createDataFrame(
        [(1, [float(x) for x in X[5]]), (2, [float(x) for x in X[40]])],
        "q_id long, q_vec array<double>",
    )
    out = ivf_knn_join(stored, queries, cents, k=3, nprobe=1)
    got = {r["q_id"]: r for r in out.where("rank = 1").collect()}
    assert got[1]["vec_id"] == 5 and got[2]["vec_id"] == 40
    # the probed-cell union appears as a static partition filter
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan.replace("#", " #").replace(
        "cell #", "cell#"
    ) or "cell IN" in plan or "cell#" in plan.split("PartitionFilters")[1][:200]
