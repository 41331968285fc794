"""F11 — result caching keyed by input fingerprint.

The reference stubs this as a TODO (main/mwas_general.py:564-568,581-584:
"hash the input file, look up previous results"). Here it is real:

* The fingerprint is an ORDER-INDEPENDENT but MULTIPLICITY-SENSITIVE
  aggregate — sum of xxhash64 over every row's canonical column tuple
  (summed in decimal(38,0) so ANSI overflow can never trip, folded back
  to 64 bits driver-side), plus the row count — so it is
  stable under repartitioning/shuffling yet distinguishes {A,B,B} from
  {A,C,C} (a bit_xor would cancel any row repeated an even number of
  times, a real hazard in raw observation CSVs). Computes in one
  distributed pass with no collect of data.
* The cache is a parquet directory per fingerprint under ``cache_dir``
  (any Hadoop-compatible FS path — local, HDFS, s3a). Presence check is
  read-and-fallback, so there is no racy exists/create window: worst
  case two writers compute the same result and one overwrite wins.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..config import DEFAULT_CONFIG, MwasConfig


def dataframe_fingerprint(df: DataFrame) -> str:
    """64-bit order-independent, multiplicity-sensitive content hash, hex.

    sum(xxhash64(row)) mod 2^64 + row count. The sum runs in decimal(38,0)
    so it cannot overflow (ANSI would throw on a long sum) for any input
    under ~10^19 rows; the mod folds it back to 64 bits driver-side.
    """
    cols = sorted(df.columns)
    row_hash = F.xxhash64(*[F.col(c).cast("string") for c in cols])
    out = (
        df.select(row_hash.cast("decimal(38,0)").alias("h"))
        .agg(F.sum("h").alias("hs"), F.count("*").alias("n"))
        .first()
    )
    hs = int(out["hs"]) if out["hs"] is not None else 0
    return f"{(hs & 0xFFFFFFFFFFFFFFFF):016x}-{out['n']}"


def mwas_cache_key(
    input_df: DataFrame,
    cfg: MwasConfig,
    *side_inputs: DataFrame,
) -> str:
    """Fingerprint of (input relation, config, every side relation) — the
    unit of result reuse. The side inputs (catalog, metadata sets,
    biosample reference) MUST participate: a changed catalog with the
    same input CSV is a different result, and keying on the input alone
    would silently serve the stale one. Their fingerprints are folded
    into one sha256 alongside the config."""
    h = hashlib.sha256(repr(cfg).encode())
    for df in side_inputs:
        h.update(dataframe_fingerprint(df).encode())
    return f"{dataframe_fingerprint(input_df)}-{h.hexdigest()[:16]}"


def run_mwas_cached(
    spark: SparkSession,
    input_df: DataFrame,
    catalog_df: DataFrame,
    sets_df: DataFrame,
    ref_df: DataFrame,
    cache_dir: str,
    cfg: MwasConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """run_mwas with parquet result reuse keyed by the input fingerprint."""
    from .mwas import run_mwas

    key = mwas_cache_key(input_df, cfg, catalog_df, sets_df, ref_df)
    path = f"{cache_dir.rstrip('/')}/{key}"
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        pass
    out = run_mwas(input_df, catalog_df, sets_df, ref_df, cfg)
    out.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def filter_unprocessed(
    input_df: DataFrame, catalog_df: DataFrame, done_results: DataFrame
) -> DataFrame:
    """W3 resume, relationally: drop input rows whose BioProject already
    has rows in a previous run's output.

    The reference resumes by processing bioproject files in name order
    and skipping ones whose outputs exist on disk; here resumability is a
    plan — resolve each input run to its bioproject through the catalog
    and anti-join the distinct done set (tiny: one row per finished
    bioproject, broadcast by AQE). Runs the catalog never maps keep
    flowing (they surface as unknown-run rows, same as a fresh run).
    """
    done = done_results.select(
        F.col("bioproject").alias("bio_project")
    ).distinct()
    resolved = input_df.join(
        catalog_df.select("run", "bio_project").distinct(), "run", "left"
    )
    return resolved.join(done, "bio_project", "left_anti").select(*input_df.columns)


def run_mwas_resume(
    spark: SparkSession,
    input_df: DataFrame,
    catalog_df: DataFrame,
    sets_df: DataFrame,
    ref_df: DataFrame,
    output_dir: str,
    cfg: MwasConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Resume a partitioned-output MWAS run: compute only the bioprojects
    missing from ``output_dir`` (a ``partitionBy(bioproject)`` sink),
    append their partitions, return the full combined relation. A crash
    mid-run costs only the unfinished bioprojects — the reference's
    file-order resume semantics, minus the file-order coupling."""
    from .mwas import run_mwas
    from ..sources.sinks import write_results_partitioned

    try:
        prev = spark.read.parquet(output_dir)
    except AnalysisException:
        prev = None
    todo = (
        input_df if prev is None else filter_unprocessed(input_df, catalog_df, prev)
    )
    if todo.limit(1).count() > 0:
        out = run_mwas(todo, catalog_df, sets_df, ref_df, cfg)
        write_results_partitioned(out, output_dir, fmt="parquet", mode="append")
    return spark.read.parquet(output_dir)
