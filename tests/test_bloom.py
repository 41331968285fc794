"""Bloom-prefilter dedup tests: no false negatives, measured fpp near
design, exact equivalence with the anti-join path on randomized
corpora, state-growth via bloom_add, and the join-skip fast path."""

import random

import pytest
from pyspark.sql import functions as F

from mwas_rfam_spark.operators.bloom import (
    BloomState,
    bloom_add,
    bloom_build,
    bloom_mark_maybe_seen,
    incremental_exact_dedup_bloom,
)
from mwas_rfam_spark.operators.dedup import incremental_exact_dedup


def _hashes(spark, values):
    return spark.createDataFrame([(v,) for v in values], ["content_hash"])


def test_no_false_negatives(spark):
    vals = [f"key-{i}" for i in range(2000)]
    bf = bloom_build(_hashes(spark, vals), fpp=0.01)
    marked = bloom_mark_maybe_seen(_hashes(spark, vals), bf).collect()
    assert all(r["__maybe_seen"] for r in marked)  # every member hits


def test_fpp_near_design(spark):
    member = [f"in-{i}" for i in range(5000)]
    probe = [f"out-{i}" for i in range(5000)]
    bf = bloom_build(_hashes(spark, member), fpp=0.01)
    marked = bloom_mark_maybe_seen(_hashes(spark, probe), bf).collect()
    fp = sum(1 for r in marked if r["__maybe_seen"])
    assert fp / len(probe) < 0.03  # design 1%, allow slack
    assert bf.false_positive_rate() < 0.015


def test_bloom_add_no_false_negatives_and_layout(spark):
    bf = bloom_build(_hashes(spark, [f"a-{i}" for i in range(1000)]), fpp=0.01)
    bf2 = bloom_add(bf, _hashes(spark, [f"b-{i}" for i in range(500)]))
    assert (bf2.num_bits, bf2.num_hashes) == (bf.num_bits, bf.num_hashes)
    assert bf2.num_items == 1500
    both = [f"a-{i}" for i in range(1000)] + [f"b-{i}" for i in range(500)]
    marked = bloom_mark_maybe_seen(_hashes(spark, both), bf2).collect()
    assert all(r["__maybe_seen"] for r in marked)
    # the old filter still rejects the added keys' complement behavior:
    # adding never clears bits
    import numpy as np

    old = np.frombuffer(bf.bits, dtype=np.uint8)
    new = np.frombuffer(bf2.bits, dtype=np.uint8)
    assert ((old & ~new) == 0).all()


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_equivalence_with_anti_join_path(spark):
    """Randomized cross-check: bloom-routed incremental dedup must give
    exactly the anti-join path's survivors and state."""
    rng = random.Random(7)
    texts = [f"document number {i}" for i in range(60)]
    batch1 = [(i, rng.choice(texts)) for i in range(40)]
    batch2 = [(100 + i, rng.choice(texts)) for i in range(40)]

    s1, h1 = incremental_exact_dedup(_docs(spark, batch1))
    s1b, h1b, bf1 = incremental_exact_dedup_bloom(_docs(spark, batch1), None, None)
    assert sorted(r["doc_id"] for r in s1.collect()) == sorted(
        r["doc_id"] for r in s1b.collect()
    )
    assert sorted(r[0] for r in h1.collect()) == sorted(r[0] for r in h1b.collect())

    s2, h2 = incremental_exact_dedup(_docs(spark, batch2), h1)
    s2b, h2b, bf2 = incremental_exact_dedup_bloom(_docs(spark, batch2), h1b, bf1)
    assert sorted(r["doc_id"] for r in s2.collect()) == sorted(
        r["doc_id"] for r in s2b.collect()
    )
    assert sorted(r[0] for r in h2.collect()) == sorted(r[0] for r in h2b.collect())
    assert bf2.num_items > bf1.num_items


def test_disjoint_batch_skips_state_join(spark):
    """A batch with no filter hits must not touch the state relation:
    survivors == the whole deduped batch, and the survivors plan carries
    no join at all."""
    seen_docs = _docs(spark, [(i, f"old doc {i}") for i in range(50)])
    _, seen, _bf_default = incremental_exact_dedup_bloom(seen_docs, None, None)
    seen = seen.localCheckpoint()  # settle state
    # tight fpp so no false positive can route a fresh row to the join
    # (at the default 1% a 30-row batch has a ~26% chance of one fp —
    # correct but it would exercise the slow path instead)
    bf = bloom_build(seen, fpp=1e-9)
    fresh = _docs(spark, [(1000 + i, f"brand new doc {i}") for i in range(30)])
    surv, upd, bf2 = incremental_exact_dedup_bloom(fresh, seen, bf)
    got = surv.collect()
    assert len(got) == 30
    plan = surv._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # fast path: anti-join skipped entirely
    assert upd.count() == 80


def test_overlapping_batch_is_exact(spark):
    seen_docs = _docs(spark, [(i, f"doc {i % 20}") for i in range(40)])
    _, seen, bf = incremental_exact_dedup_bloom(seen_docs, None, None)
    mixed = _docs(
        spark,
        [(500 + i, f"doc {i}") for i in range(10)]  # dups of seen (0..9)
        + [(600 + i, f"unseen {i}") for i in range(10)],
    )
    surv, upd, _ = incremental_exact_dedup_bloom(mixed, seen, bf)
    ids = sorted(r["doc_id"] for r in surv.collect())
    assert ids == [600 + i for i in range(10)]
    assert upd.count() == 30


def test_lost_filter_falls_back_to_exact_path(spark):
    """bloom=None with a surviving hash relation (e.g. a restart that
    persisted only the parquet state) must behave exactly like the plain
    anti-join path — known duplicates stay out and the updated state
    keeps the full history — and hand back a rebuilt filter."""
    seen_docs = _docs(spark, [(i, f"doc {i % 20}") for i in range(40)])
    _, seen, _ = incremental_exact_dedup_bloom(seen_docs, None, None)
    seen = seen.localCheckpoint()
    mixed = _docs(
        spark,
        [(500 + i, f"doc {i}") for i in range(10)]  # dups of seen (0..9)
        + [(600 + i, f"unseen {i}") for i in range(10)],
    )
    surv, upd, bf = incremental_exact_dedup_bloom(mixed, seen, None)
    ids = sorted(r["doc_id"] for r in surv.collect())
    assert ids == [600 + i for i in range(10)]  # dups rejected without a filter
    assert upd.count() == 30  # 20 historical + 10 new: history preserved
    # the rebuilt filter covers the merged state: no false negatives
    from mwas_rfam_spark.operators.dedup import normalize_text

    hashed = seen_docs.withColumn("content_hash", F.md5(normalize_text(F.col("text"))))
    marked = bloom_mark_maybe_seen(hashed, bf)
    assert marked.where("NOT __maybe_seen").count() == 0
