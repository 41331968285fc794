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
