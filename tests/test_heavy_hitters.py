"""Heavy-hitter tests: exact equivalence with the full groupBy under
random and adversarial partitionings (the superset guarantee is a
theorem; the tests check it survives the implementation), support
validation, and a real-table run."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mwas_rfam_spark.operators.summary import heavy_hitters


def _exact(df, key_col, support):
    n = df.count()
    return {
        r[key_col]: r["cnt"]
        for r in df.groupBy(key_col)
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= support * n)
        .collect()
    }


@pytest.mark.parametrize("partitions", [1, 7, 32])
def test_matches_exact_across_partitionings(spark, partitions):
    rng = random.Random(3)
    # zipf-ish: few hot keys, long tail
    rows = [(f"hot{i % 3}",) for i in range(3000)] + [
        (f"tail{rng.randrange(5000)}",) for _ in range(7000)
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, ["k"]).repartition(partitions)
    want = _exact(df, "k", 0.05)
    got = {r["k"]: r["cnt"] for r in heavy_hitters(df, "k", support=0.05).collect()}
    assert got == want
    assert set(got) == {"hot0", "hot1", "hot2"}


def test_adversarial_partitioning(spark):
    """A heavy key spread thin across partitions must still surface:
    range-partition by an id correlated with the key so each partition
    sees the hot key diluted differently."""
    rows = [(i, "hot" if i % 10 == 0 else f"t{i}") for i in range(10_000)]
    df = (
        spark.createDataFrame(rows, ["id", "k"])
        .repartitionByRange(16, "id")
        .select("k")
    )
    got = {r["k"]: r["cnt"] for r in heavy_hitters(df, "k", support=0.08).collect()}
    assert got == {"hot": 1000}


def test_borderline_support(spark):
    # key at exactly the support threshold must be included (>= semantics)
    rows = [("edge",)] * 10 + [(f"x{i}",) for i in range(90)]
    df = spark.createDataFrame(rows, ["k"]).repartition(4)
    got = {r["k"] for r in heavy_hitters(df, "k", support=0.1).collect()}
    assert "edge" in got


def test_bad_support_raises(spark):
    df = spark.createDataFrame([("a",)], ["k"])
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", support=0.0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", support=1.5)


def test_documents_tokens(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    want = _exact(toks, "tok", 0.02)
    got = {
        r["tok"]: r["cnt"]
        for r in heavy_hitters(toks, "tok", support=0.02).collect()
    }
    assert got == want and len(got) > 0


def test_null_keys_count(spark):
    """A null key above support is a heavy hitter like any other value —
    phase 1 must count it (dropna=False) and phase 2's semi-join must be
    null-safe, or the 'provable superset' claim silently excludes null."""
    rows = [(None,)] * 30 + [(f"t{i}",) for i in range(70)]
    df = spark.createDataFrame(rows, "k string").repartition(5)
    got = {r["k"]: r["cnt"] for r in heavy_hitters(df, "k", support=0.2).collect()}
    assert got == {None: 30}


def test_bounded_memory_candidate_summary(spark):
    """Misra-Gries phase 1 still matches exact output on a high-vocab
    partition (the case the bounded summary exists for), including when
    every key in a partition is distinct."""
    rng = random.Random(11)
    rows = [("hh",)] * 400 + [(f"u{i}",) for i in range(9600)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, ["k"]).repartition(3)
    want = _exact(df, "k", 0.04)
    got = {r["k"]: r["cnt"] for r in heavy_hitters(df, "k", support=0.04).collect()}
    assert got == want == {"hh": 400}


def test_exact_support_boundary_kept(spark):
    """ADVICE r4: a key whose frequency is EXACTLY support × rows must
    be kept — the float product 0.01*300 == 3.0000000000000004 would
    drop it; the cnt/n >= support comparison keeps it."""
    rows = [("bar",)] * 3 + [(f"u{i}",) for i in range(297)]
    df = spark.createDataFrame(rows, ["k"]).repartition(4)
    got = {r["k"]: r["cnt"] for r in heavy_hitters(df, "k", support=0.01).collect()}
    assert got["bar"] == 3
