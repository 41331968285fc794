"""HLL cardinality-sketch tests: estimate accuracy vs exact, the
mergeable-state rollup property (union of stored sketches == rescan-free
estimate), and cross-granularity rollups on the documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mwas_rfam_spark.operators.summary import (
    cardinality_from_states,
    cardinality_sketch_state,
    grouped_cardinality,
)


@pytest.fixture(scope="module")
def keyed(spark):
    # 40k rows, 8k distinct keys, 4 groups
    return (
        spark.range(40_000)
        .select(
            (F.col("id") % 8_000).alias("k"),
            (F.col("id") % 4).alias("g"),
        )
        .cache()
    )


def test_estimate_close_to_exact(keyed):
    exact = {
        r["g"]: r["n_distinct"]
        for r in grouped_cardinality(keyed, "k", ["g"], exact=True).collect()
    }
    est = {
        r["g"]: r["n_distinct"]
        for r in grouped_cardinality(keyed, "k", ["g"]).collect()
    }
    assert set(exact) == set(est)
    for g in exact:
        assert abs(est[g] - exact[g]) / exact[g] < 0.05  # lg_k=12 → ~1.6% σ


def test_global_without_groups(keyed):
    exact = grouped_cardinality(keyed, "k", exact=True).collect()[0]["n_distinct"]
    est = grouped_cardinality(keyed, "k").collect()[0]["n_distinct"]
    assert exact == 8_000
    assert abs(est - exact) / exact < 0.05


def test_state_rollup_no_rescan(keyed):
    """Stored per-(g, shard) sketches roll up to per-g and global
    estimates purely from the state rows."""
    sharded = keyed.withColumn("shard", (F.col("k") % 3))
    states = cardinality_sketch_state(sharded, "k", ["g", "shard"]).cache()
    assert states.count() == 12
    per_g = {
        r["g"]: r["n_distinct"]
        for r in cardinality_from_states(states, ["g"]).collect()
    }
    exact = {
        r["g"]: r["n_distinct"]
        for r in grouped_cardinality(keyed, "k", ["g"], exact=True).collect()
    }
    for g in exact:
        assert abs(per_g[g] - exact[g]) / exact[g] < 0.05
    global_est = cardinality_from_states(states).collect()[0]["n_distinct"]
    assert abs(global_est - 8_000) / 8_000 < 0.05


def test_merge_consistent_with_direct_sketch(keyed):
    """Union of disjoint halves' sketches estimates ≈ one sketch over
    the whole — merge loses nothing material."""
    halves = keyed.withColumn("half", (F.col("k") >= 4_000).cast("int"))
    states = cardinality_sketch_state(halves, "k", ["half"])
    merged = cardinality_from_states(states).collect()[0]["n_distinct"]
    direct = grouped_cardinality(keyed, "k").collect()[0]["n_distinct"]
    assert abs(merged - direct) / direct < 0.02


def test_documents_tokens_per_source(spark, sf_dir):
    """Real-table use: distinct token estimate per source, states
    written per source then rolled up globally."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "source", F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    per_src_exact = {
        r["source"]: r["n_distinct"]
        for r in grouped_cardinality(toks, "tok", ["source"], exact=True).collect()
    }
    states = cardinality_sketch_state(toks, "tok", ["source"])
    per_src_est = {
        r["source"]: r["n_distinct"]
        for r in cardinality_from_states(states, ["source"]).collect()
    }
    for s, n in per_src_exact.items():
        assert abs(per_src_est[s] - n) / max(n, 1) < 0.05
    global_exact = toks.select("tok").distinct().count()
    global_est = cardinality_from_states(states).collect()[0]["n_distinct"]
    assert abs(global_est - global_exact) / global_exact < 0.05
