"""Round-5 expansion operators: BM25 lexical ranking, leakage-safe
splits, incremental embedding dedup, and the skew diagnosis report."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---- BM25 ----


def test_bm25_duckdb_parity(spark, sf_dir):
    """Score-for-score parity with an independent DuckDB formulation of
    Okapi BM25 over the real documents table."""
    import duckdb

    from mwas_rfam_spark.operators.retrieval import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    terms = ["the", "data", "pipeline"]
    got = [
        (r["doc_id"], round(r["score"], 6), r["n_matched"])
        for r in bm25_topk(docs, terms, k=15).collect()
    ]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = con.execute(
        """
        WITH base AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                             x -> x <> '') AS toks
          FROM documents),
        lens AS (SELECT doc_id, len(toks) AS dl FROM base),
        totals AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
        matched AS (
          SELECT doc_id, t.term, count(*) AS tf
          FROM base, unnest(toks) AS t(term)
          WHERE t.term IN ('the', 'data', 'pipeline')
          GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS df FROM matched GROUP BY 1),
        scored AS (
          SELECT m.doc_id,
                 sum(ln(1 + (tt.n_docs - d.df + 0.5) / (d.df + 0.5))
                     * (m.tf * 2.2)
                     / (m.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / tt.avgdl))
                 ) AS score,
                 count(*) AS n_matched
          FROM matched m
          JOIN dfreq d USING (term) JOIN lens l USING (doc_id), totals tt
          GROUP BY 1)
        SELECT doc_id, round(score, 6) AS score, n_matched
        FROM scored ORDER BY score DESC, doc_id LIMIT 15
        """
    ).fetchall()
    assert got == [(r[0], r[1], r[2]) for r in want]
    assert len(got) == 15


def test_bm25_hand_model(spark):
    """Tiny corpus scored by hand: tf saturation and dl normalization."""
    from mwas_rfam_spark.operators.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple kiwi kiwi kiwi kiwi kiwi"),
            (3, "pear plum"),
            (4, ""),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in bm25_topk(docs, ["apple"], k=10).collect()}
    # N=4, df(apple)=2, idf = ln(1 + 2.5/2.5) = ln 2
    # avgdl = (3+6+2+0)/4 = 2.75
    idf = math.log(2.0)

    def s(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 2.75))

    assert rows[1]["score"] == pytest.approx(s(2, 3))
    assert rows[2]["score"] == pytest.approx(s(1, 6))
    assert 3 not in rows and 4 not in rows
    assert rows[1]["score"] > rows[2]["score"]  # tf wins over longer doc

    with pytest.raises(ValueError):
        bm25_topk(docs, [])
    with pytest.raises(ValueError):
        bm25_topk(docs, ["x"], k=0)


# ---- leakage-safe split ----


def test_leakage_safe_split_clusters_together(spark):
    from mwas_rfam_spark.plans.sampling import hash_split, leakage_safe_split

    docs = spark.range(2000).withColumnRenamed("id", "doc_id")
    # every 10 consecutive ids form one near-dup cluster
    clusters = docs.select(
        "doc_id", (F.col("doc_id") - F.col("doc_id") % 10).alias("cluster_id")
    )
    out = leakage_safe_split(docs, clusters, {"train": 0.8, "test": 0.2}, seed=1)
    # one label per cluster — never split across
    viol = (
        out.select((F.col("doc_id") - F.col("doc_id") % 10).alias("c"), "split")
        .groupBy("c")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
    )
    assert viol.count() == 0
    # both labels actually occur, roughly at the requested rate
    frac = out.where(F.col("split") == "test").count() / 2000
    assert 0.1 < frac < 0.3

    # singleton docs (no cluster row) reduce to plain hash_split labels
    alone = spark.range(500, 900).withColumnRenamed("id", "doc_id")
    a = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(
            alone, clusters.limit(0), {"train": 0.8, "test": 0.2}, seed=1
        ).collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(alone, {"train": 0.8, "test": 0.2}, seed=1).collect()
    }
    assert a == b

    with pytest.raises(ValueError):
        leakage_safe_split(docs, clusters, {"train": 0.5, "test": 0.1})


def test_leakage_safe_split_from_dedup_clusters(spark):
    """End-to-end with real dedup output: near-dup docs land on one side."""
    from mwas_rfam_spark.operators.dedup import dedup_clusters, ngram_jaccard_pairs
    from mwas_rfam_spark.plans.sampling import leakage_safe_split

    rows = []
    for i in range(40):
        base = f"document number {i} has unique content token{i} marker{i} end"
        rows.append((2 * i, base))
        rows.append((2 * i + 1, base + " extra"))  # near-dup of its even twin
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_df=None)
    cl = dedup_clusters(pairs, docs=docs).select("doc_id", "cluster_id")
    out = leakage_safe_split(docs, cl, {"train": 0.7, "test": 0.3}, seed=3)
    twins = (
        out.select((F.col("doc_id") - F.col("doc_id") % 2).alias("pair"), "split")
        .groupBy("pair")
        .agg(F.countDistinct("split").alias("k"))
    )
    assert twins.where(F.col("k") > 1).count() == 0


# ---- incremental embedding dedup ----


def _np_reference(batch, state, threshold):
    """Independent spelled-out rule: drop iff near a same-cell state
    vector or a smaller-id same-cell batch vector."""
    import numpy as np

    dropped = set()
    for vid, cell, v in batch:
        near_state = any(
            c == cell
            and float(np.dot(v, sv) / (np.linalg.norm(v) * np.linalg.norm(sv)))
            >= threshold
            for c, sv in state
        )
        near_smaller = any(
            c2 == cell
            and vid2 < vid
            and float(np.dot(v, v2) / (np.linalg.norm(v) * np.linalg.norm(v2)))
            >= threshold
            for vid2, c2, v2 in batch
        )
        if near_state or near_smaller:
            dropped.add(vid)
    return dropped


def test_incremental_embedding_dedup_equivalence(spark):
    import numpy as np

    from mwas_rfam_spark.operators.dedup import (
        embedding_dedup_state,
        incremental_embedding_dedup,
    )
    from mwas_rfam_spark.operators.similarity import assign_ivf_cells

    rng = np.random.default_rng(5)
    dim = 8
    cents = [rng.standard_normal(dim).tolist() for _ in range(3)]

    def mk(ids, planted_near=None):
        rows = []
        for i in ids:
            v = rng.standard_normal(dim)
            rows.append((i, (v / np.linalg.norm(v)).tolist()))
        if planted_near:
            for i, src in planted_near:
                base = np.array(dict(rows)[src])
                v = base + rng.standard_normal(dim) * 0.01
                rows.append((i, (v / np.linalg.norm(v)).tolist()))
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    seed_emb = mk(range(10))
    state = embedding_dedup_state(seed_emb, cents).localCheckpoint()
    batch_emb = mk(range(100, 115), planted_near=[(200, 100), (201, 100), (210, 105)])
    surv, updated = incremental_embedding_dedup(batch_emb, state, cents, threshold=0.95)
    got_survivors = sorted(r["vec_id"] for r in surv.collect())

    # reference computation
    cell_of = {
        r["vec_id"]: r["cell"]
        for r in assign_ivf_cells(batch_emb.unionByName(seed_emb), cents).collect()
    }
    batch = [
        (r["vec_id"], cell_of[r["vec_id"]], np.array(r["embedding"]))
        for r in batch_emb.collect()
    ]
    st = [(cell_of[r["vec_id"]], np.array(r["embedding"])) for r in seed_emb.collect()]
    dropped = _np_reference(batch, st, 0.95)
    want = sorted(i for i, _, _ in batch if i not in dropped)
    assert got_survivors == want
    assert len(got_survivors) < 18  # the planted near-dups actually dropped

    # state grows by exactly the survivors
    assert updated.count() == 10 + len(got_survivors)

    # a later exact copy of a KEPT batch vector is dropped by the new state
    if 100 in got_survivors:
        v100 = next(v for i, _, v in batch if i == 100)
        again = spark.createDataFrame(
            [(300, v100.tolist())], "vec_id long, embedding array<double>"
        )
        surv2, _ = incremental_embedding_dedup(again, updated, cents, threshold=0.95)
        assert surv2.count() == 0


def test_train_dedup_quantizer_auto_k(spark):
    """Auto-k at a constant cell target (r5 verdict task #3): k tracks
    corpus size, floors at min_cells, rejects nonsense targets, and the
    returned centroids drive the incremental probe unchanged."""
    import numpy as np
    import pytest

    from mwas_rfam_spark.operators.dedup import (
        embedding_dedup_state,
        incremental_embedding_dedup,
        train_dedup_quantizer,
    )

    rng = np.random.default_rng(11)
    rows = [(i, (lambda v: (v / np.linalg.norm(v)).tolist())(rng.standard_normal(6)))
            for i in range(600)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = train_dedup_quantizer(emb, cell_target=50, iters=1)
    assert len(cents) == 12 and len(cents[0]) == 6  # round(600/50)
    assert len(train_dedup_quantizer(emb, cell_target=10_000, iters=0)) == 8  # floor
    with pytest.raises(ValueError, match="cell_target"):
        train_dedup_quantizer(emb, cell_target=0)

    # the frozen-quantizer contract: the same centroids build the state
    # and serve later probes — an exact re-submission is dropped
    state = embedding_dedup_state(emb, cents).localCheckpoint()
    again = spark.createDataFrame(rows[:5], "vec_id long, embedding array<double>")
    surv, _ = incremental_embedding_dedup(
        again.select((F.col("vec_id") + 1000).alias("vec_id"), "embedding"),
        state, cents, threshold=0.999,
    )
    assert surv.count() == 0


def test_incremental_embedding_dedup_no_state(spark):
    import numpy as np

    from mwas_rfam_spark.operators.dedup import incremental_embedding_dedup

    rng = np.random.default_rng(9)
    v = rng.standard_normal(6)
    v = v / np.linalg.norm(v)
    rows = [(1, v.tolist()), (2, v.tolist()), (3, (-v).tolist())]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [v.tolist()]
    surv, state = incremental_embedding_dedup(emb, None, cents, threshold=0.99)
    assert sorted(r["vec_id"] for r in surv.collect()) == [1, 3]
    assert state.count() == 2


# ---- skew report ----


def test_skew_report_hand_computed(spark):
    from mwas_rfam_spark.operators.summary import skew_report

    rows = [("hot",)] * 80 + [("warm",)] * 15 + [(None,)] * 5
    df = spark.createDataFrame(rows, "k string").repartition(4)
    got = {r["key"]: r for r in skew_report(df, "k", top_n=3, parallelism=10).collect()}
    assert got["hot"]["cnt"] == 80 and got["hot"]["frac"] == 0.8
    # fair share = 100/10 = 10 rows; hot occupies 8 shares
    assert got["hot"]["skew_ratio"] == 8.0 and got["hot"]["salt_factor"] == 8
    assert got["warm"]["salt_factor"] == 2  # ceil(1.5)
    assert got[None]["cnt"] == 5 and got[None]["salt_factor"] == 1
    with pytest.raises(ValueError):
        skew_report(df, "k", top_n=0)


def test_leakage_safe_split_rejects_negative_fractions(spark):
    """Review r5: delegation to hash_split restores the negative-fraction
    guard (sum==1 alone would accept train=1.2/test=-0.2 and silently
    put every row in train)."""
    from mwas_rfam_spark.plans.sampling import leakage_safe_split

    docs = spark.range(10).withColumnRenamed("id", "doc_id")
    cl = docs.select("doc_id", F.col("doc_id").alias("cluster_id"))
    with pytest.raises(ValueError):
        leakage_safe_split(docs, cl, {"train": 1.2, "test": -0.2})


def test_bm25_null_text_counts_as_empty(spark):
    """Review r5: a NULL-text row is the empty document (counted in
    n_docs AND in avgdl as dl=0), not a silent avgdl exclusion."""
    from mwas_rfam_spark.operators.retrieval import bm25_topk

    with_null = spark.createDataFrame(
        [(1, "apple apple banana"), (2, None), (3, "apple")],
        "doc_id long, text string",
    )
    with_empty = spark.createDataFrame(
        [(1, "apple apple banana"), (2, ""), (3, "apple")],
        "doc_id long, text string",
    )
    a = [(r["doc_id"], round(r["score"], 10)) for r in bm25_topk(with_null, ["apple"]).collect()]
    b = [(r["doc_id"], round(r["score"], 10)) for r in bm25_topk(with_empty, ["apple"]).collect()]
    assert a == b and len(a) == 2


def test_png_corrupt_raises_valueerror():
    """Review r5: corrupt-but-signed PNGs reject with the documented
    ValueError, not a leaked zlib/struct error."""
    import struct
    import zlib

    from mwas_rfam_spark.functions.png_codec import decode_png, encode_png

    good = encode_png(2, 2, 3, bytes(12))

    def chunk(ctype, payload):
        body = ctype + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    sig = good[:8]
    truncated_ihdr = sig + chunk(b"IHDR", b"\x00" * 5) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IHDR"):
        decode_png(truncated_ihdr)
    bad_idat = sig + good[8 : 8 + 25] + chunk(b"IDAT", b"notzlibdata") + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IDAT"):
        decode_png(bad_idat)
