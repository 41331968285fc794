"""Sinks (SURVEY.md §2.1 S9-S12).

The reference accumulates CSV strings per BioProject and concatenates
files by hand (mg:631-679); on Spark both shapes are one write:
partitioned output is `partitionBy`, the combined file is the same
DataFrame with coalesce(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_results_partitioned(
    results: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite"
) -> None:
    """S9 — one output per bioproject via partitioned write (replaces the
    per-BP csv loop at mg:631-650). ``mode="append"`` adds new
    bioprojects' partitions without touching finished ones (the W3
    resume path in operators/caching.run_mwas_resume)."""
    writer = results.write.mode(mode).partitionBy("bioproject")
    (writer.parquet(path) if fmt == "parquet" else writer.option("header", True).csv(path))


def write_results_combined(results: DataFrame, path: str) -> None:
    """S10 — single combined CSV (mg:668-679); coalesce(1) only because a
    single file is the contract — drop it for parallel output."""
    results.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def write_training_shards(
    docs: DataFrame,
    path: str,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """Materialize a training epoch: one parquet directory per shard with
    rows stored in the deterministic shuffled order
    (plans/sampling.shuffle_shard's shard/seq — reproducible across
    engines and cluster layouts, unlike rand(seed)).

    One repartition keyed on shard aligns tasks with output directories,
    and sortWithinPartitions pins the in-file row order to `seq`, so a
    reader streaming any shard file sees the epoch order directly — no
    shuffle at training time. At 100 TB pick n_shards = the file
    parallelism the trainer wants; each shard sorts independently.
    """
    from pyspark.sql import functions as F

    from mwas_rfam_spark.plans.sampling import shuffle_shard

    sharded = shuffle_shard(docs, n_shards=n_shards, seed=seed, id_col=id_col)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "seq")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
