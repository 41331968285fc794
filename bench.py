"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation, no
driver-side collect overhead).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from mwas_rfam_spark.config import MwasConfig
from mwas_rfam_spark.session import get_spark

HEADLINE = [
    "mwas_cohort_welch",
    "condense_sets",
    "j1_outer_join_agg",
    "a4_two_level_rollup",
    "a7_signature_dedup",
    "w5_topk_per_group",
    "t1_welch_from_stats",
    "condense_readable",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_pipeline",
    "dedup_minhash_lsh",
    "dedup_minhash_md5",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "multimodal_decode",
    "text_lang_quality",
    "text_winnowing",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "events_hourly",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _warmup(spark, sf_dir):
    """Untimed: pull parquet footers/schemas into cache and warm the JVM
    (codegen, Arrow) and the Python worker pool so timings measure the
    engine, not first-query startup (a cold worker pays ~200ms of
    pandas/numpy import; 32 workers booting inside a timed stage is ~7s)."""
    from pyspark.sql import functions as F

    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    _identity = F.pandas_udf(lambda v: v, "double")
    cpus = spark.sparkContext.defaultParallelism
    spark.range(cpus * 100).repartition(cpus * 2).select(
        F.sum(_identity(F.col("id").cast("double")))
    ).collect()


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _mwas_full(spark, sf_dir):
    """Complete MWAS incl. seeded permutation tests (the reference's
    dominant production workload)."""
    from mwas_rfam_spark.operators.condense import condense_metadata
    from mwas_rfam_spark.operators.mwas import run_mwas
    from mwas_rfam_spark.plans.testdata_mwas import (
        mwas_catalog_from_orders,
        mwas_input_from_events,
        mwas_metadata_long_from_customer,
    )

    cfg = MwasConfig(permutation_resamples=10_000)
    sets_df, ref_df = condense_metadata(mwas_metadata_long_from_customer(spark, sf_dir))
    return run_mwas(
        mwas_input_from_events(spark, sf_dir),
        mwas_catalog_from_orders(spark, sf_dir),
        sets_df,
        ref_df,
        cfg,
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="mwas-bench")

    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    _warmup(spark, sf_dir)

    def _timed(fn) -> float:
        """min of 2 runs: single-shot numbers on this box vary up to 4×
        (GC / scheduler noise); the minimum is the steady-state cost.
        Caches are cleared between runs so each timing is cold-plan."""
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _force(fn())
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        return round(best, 3)

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = _timed(lambda: qs[name](spark, sf_dir))

    timings["mwas_full"] = _timed(lambda: _mwas_full(spark, sf_dir))

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
