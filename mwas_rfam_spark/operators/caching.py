"""F11 — result caching keyed by input fingerprint.

The reference stubs this as a TODO (main/mwas_general.py:564-568,581-584:
"hash the input file, look up previous results"). Here it is real:

* The fingerprint is an ORDER-INDEPENDENT aggregate — bit_xor of
  xxhash64 over every row's canonical column tuple — so it is stable
  under repartitioning/shuffling, computes in one distributed pass with
  no collect of data, and costs one scan of the input (tiny next to the
  statistics it saves).
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
    """64-bit order-independent content hash of a DataFrame, as hex."""
    cols = sorted(df.columns)
    row_hash = F.xxhash64(*[F.col(c).cast("string") for c in cols])
    out = (
        df.select(row_hash.alias("h"))
        .agg(F.expr("bit_xor(h)").alias("hx"), F.count("*").alias("n"))
        .first()
    )
    hx = out["hx"] if out["hx"] is not None else 0
    return f"{(hx & 0xFFFFFFFFFFFFFFFF):016x}-{out['n']}"


def mwas_cache_key(input_df: DataFrame, cfg: MwasConfig) -> str:
    """Fingerprint of (input relation, config) — the unit of result reuse."""
    cfg_hash = hashlib.sha256(repr(cfg).encode()).hexdigest()[:16]
    return f"{dataframe_fingerprint(input_df)}-{cfg_hash}"


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

    key = mwas_cache_key(input_df, cfg)
    path = f"{cache_dir.rstrip('/')}/{key}"
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        pass
    out = run_mwas(input_df, catalog_df, sets_df, ref_df, cfg)
    out.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
