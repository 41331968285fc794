"""Whole-document bin packing (best-fit-decreasing within hash buckets)
and the packing utilization report."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mwas_rfam_spark.operators.packing import (
    bin_pack_documents,
    pack_documents,
    pack_utilization,
)


def _docs(spark, counts: dict):
    return spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in counts.items()],
        "doc_id long, text string",
    )


def test_binpack_invariants_and_determinism(spark):
    """Every doc assigned exactly once; no pack exceeds the budget;
    oversize docs isolate flagged; pack count within the BFD guarantee
    of the per-bucket lower bound; identical output across input
    partitionings."""
    import math

    counts = {i: (i * 37) % 90 + 5 for i in range(150)}
    counts[900] = 300  # oversize
    docs = _docs(spark, counts)
    out = bin_pack_documents(docs, max_tokens_per_pack=128, n_buckets=4)
    rows = out.collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(counts)
    assert all(r["n_tokens"] == counts[r["doc_id"]] for r in rows)

    fills: dict = {}
    for r in rows:
        if r["oversize"]:
            continue
        fills[r["pack_id"]] = fills.get(r["pack_id"], 0) + r["n_tokens"]
    assert fills and max(fills.values()) <= 128

    over = [r for r in rows if r["oversize"]]
    assert [r["doc_id"] for r in over] == [900]
    # the oversize pack holds only that doc
    assert sum(1 for r in rows if r["pack_id"] == over[0]["pack_id"]) == 1

    # per-bucket BFD guarantee vs the ceil lower bound
    by_bucket: dict = {}
    packs_by_bucket: dict = {}
    for r in rows:
        if r["oversize"]:
            continue
        by_bucket[r["bucket"]] = by_bucket.get(r["bucket"], 0) + r["n_tokens"]
        packs_by_bucket.setdefault(r["bucket"], set()).add(r["pack_id"])
    for b, total in by_bucket.items():
        lower = math.ceil(total / 128)
        assert len(packs_by_bucket[b]) <= math.ceil(11 * lower / 9) + 1

    again = bin_pack_documents(
        docs.repartition(13), max_tokens_per_pack=128, n_buckets=4
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_binpack_best_fit_hand_model(spark):
    """One bucket, hand-checkable: sizes 60, 50, 40, 30, 20 at budget
    100 — BFD gives {60+40}, {50+30+20}: exactly two packs."""
    docs = _docs(spark, {1: 60, 2: 50, 3: 40, 4: 30, 5: 20})
    out = bin_pack_documents(docs, max_tokens_per_pack=100, n_buckets=1).collect()
    packs: dict = {}
    for r in out:
        packs.setdefault(r["pack_id"], set()).add(r["doc_id"])
    assert sorted(map(sorted, packs.values())) == [[1, 3], [2, 4, 5]]

    with pytest.raises(Exception, match="own_pack|max_tokens_per_pack"):
        bin_pack_documents(
            _docs(spark, {1: 200}), max_tokens_per_pack=100, n_buckets=1,
            oversize="error",
        ).collect()
    with pytest.raises(ValueError, match="oversize"):
        bin_pack_documents(docs, max_tokens_per_pack=100, oversize="maybe")
    with pytest.raises(ValueError, match="max_tokens_per_pack"):
        bin_pack_documents(docs, max_tokens_per_pack=0)


def test_pack_utilization_hand_model(spark):
    """Report fields from a hand-built assignment: two full-ish packs +
    one oversize pack; avg_fill/waste computed over non-oversize only."""
    docs = _docs(spark, {1: 60, 2: 40, 3: 80, 4: 150})
    out = bin_pack_documents(docs, max_tokens_per_pack=100, n_buckets=1)
    rep = pack_utilization(out, 100).first()
    assert rep["n_docs"] == 4 and rep["total_tokens"] == 330
    assert rep["n_packs"] == 3  # {60+40}, {80}, oversize {150}
    assert rep["avg_fill"] == pytest.approx((1.0 + 0.8) / 2, abs=1e-6)
    assert rep["waste_frac"] == pytest.approx(1.0 - 180 / 200, abs=1e-6)

    # the cumsum packer's straddle attribution would make fill metrics
    # read >1 / negative — rejected with a named error, not nonsense
    cum = pack_documents(docs, max_tokens_per_pack=100, n_buckets=1)
    with pytest.raises(ValueError, match="whole-document"):
        pack_utilization(cum, 100)


def test_binpack_null_text_packs_as_zero(spark):
    """Null text (present in real corpora) must not kill the kernel:
    it packs as a zero-size doc; a null PRECOMPUTED count likewise."""
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "d e")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bin_pack_documents(
        docs, max_tokens_per_pack=10, n_buckets=2).collect()}
    assert out[2]["n_tokens"] == 0 and not out[2]["oversize"]
    assert sorted(out) == [1, 2, 3]

    pre = spark.createDataFrame(
        [(1, 5), (2, None)], "doc_id long, nt int"
    ).withColumn("text", F.lit("x"))
    out2 = {r["doc_id"]: r["n_tokens"] for r in bin_pack_documents(
        pre, max_tokens_per_pack=10, n_buckets=1, token_count_col="nt").collect()}
    assert out2 == {1: 5, 2: 0}


def test_pack_documents_rejects_bad_budget(spark):
    """pack_documents now shares its siblings' budget guard: a
    non-positive budget is a ValueError, not silent garbage packs."""
    docs = _docs(spark, {1: 10})
    with pytest.raises(ValueError, match="max_tokens_per_pack"):
        pack_documents(docs, max_tokens_per_pack=0)
    with pytest.raises(ValueError, match="max_tokens_per_pack"):
        pack_documents(docs, max_tokens_per_pack=-5)


def test_packers_validate_n_buckets_and_null_ids(spark):
    """r12 review findings: n_buckets=0 was a mid-job ANSI
    DIVIDE_BY_ZERO and the old two-hex-digit bucket source capped
    parallelism at 256, forcing corpus-scale per-bucket state into each
    kernel call (r13: the source is now hex_prefix_u32(md5(id)) with a
    65,536 sanity bound); a NULL doc_id crashed bin_pack's kernel with
    int(NaN) — both now refuse."""
    from mwas_rfam_spark.operators.packing import (
        bin_pack_documents,
        pack_documents,
        pack_utilization,
    )

    docs = spark.createDataFrame(
        [(1, "a few words"), (2, "more words here")], "doc_id long, text string"
    )
    for bad in (0, 65537):
        with pytest.raises(ValueError, match="n_buckets"):
            pack_documents(docs, 512, n_buckets=bad)
        with pytest.raises(ValueError, match="n_buckets"):
            bin_pack_documents(docs, 512, n_buckets=bad)
    nulled = spark.createDataFrame(
        [(None, "ghost doc words")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="non-null id"):
        bin_pack_documents(nulled, 512).collect()
    with pytest.raises(Exception, match="non-null id"):
        pack_documents(nulled, 512).collect()
    with pytest.raises(ValueError, match="max_tokens_per_pack"):
        pack_utilization(bin_pack_documents(docs, 512), 0)


def test_pack_documents_null_precomputed_count_is_zero(spark):
    """r12 review finding: a NULL precomputed token count leaked NULL
    into pack_documents' n_tokens output where bin_pack emitted 0."""
    from mwas_rfam_spark.operators.packing import pack_documents

    docs = spark.createDataFrame(
        [(1, "x", 10), (2, "y", None)], "doc_id long, text string, n long"
    )
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in pack_documents(docs, 512, token_count_col="n").collect()
    }
    assert got == {1: 10, 2: 0}


def test_bin_pack_many_tiny_docs_fast(spark):
    """r12 review finding: full (rem==0) packs were never retired, so a
    many-tiny-uniform-docs bucket paid O(n*P) element shifts — this run
    completes quickly now (and the assignment stays valid)."""
    import time

    from mwas_rfam_spark.operators.packing import bin_pack_documents

    docs = spark.createDataFrame(
        [(i, 64) for i in range(40_000)], "doc_id long, n long"
    )
    t0 = time.time()
    out = bin_pack_documents(
        docs, 128, n_buckets=1, text_col="doc_id", token_count_col="n"
    )
    per_pack = out.groupBy("pack_id").sum("n_tokens").collect()
    assert time.time() - t0 < 60
    assert all(r["sum(n_tokens)"] <= 128 for r in per_pack)
    assert len(per_pack) == 20_000  # perfect 2-per-pack fit


def test_packers_refuse_negative_token_counts(spark):
    """r13 review finding: a negative precomputed count (a -1 'unknown'
    sentinel) silently RAISED bin-pack capacity above the budget and
    made the cumsum packer's running total non-monotonic."""
    from mwas_rfam_spark.operators.packing import (
        bin_pack_documents,
        pack_documents,
    )

    docs = spark.createDataFrame(
        [(1, "x", 10), (2, "y", -1)], "doc_id long, text string, nt long"
    )
    with pytest.raises(Exception, match="negative token count"):
        bin_pack_documents(
            docs, 100, n_buckets=1, token_count_col="nt"
        ).collect()
    with pytest.raises(Exception, match="negative token count"):
        pack_documents(docs, 100, n_buckets=1, token_count_col="nt").collect()
