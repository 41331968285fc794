"""Deterministic MWAS-shaped views over the driver's synthetic tables.

The driver testdata is TPC-H-ish (TESTDATA.md); the MWAS engine's domain
relations (input / catalog / metadata) are derived from it with pure
column expressions so the same derivation is reproducible in DuckDB for
the oracle comparison:

* ``events``  → observation input: run = 'R' || event_id, group =
  event_type, quantifier = value.
* ``orders`` + ``customer`` → catalog: each order is a run of biosample
  'SAM' || custkey within bioproject 'PRJ' || nationkey; spots from
  o_totalprice.
* ``customer`` → per-bioproject metadata: attributes mktsegment and an
  acctbal bucket.

This gives the flagship query real join/agg/test structure at every scale
factor without synthesizing new files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ensure_epoch_nanos(spark: SparkSession, df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a timestamp column to epoch-nanos LONG across driver
    testdata generations. TIMESTAMP(NANOS) parquet arrives as long via
    ``spark.sql.legacy.parquet.nanosAsLong``; micros-precision
    generations arrive as timestamp/timestamp_ntz and are converted here
    (naive wall clock read as UTC — exactly DuckDB's ``epoch_us`` view of
    the same values, so oracles stay engine-identical). Downstream
    timeline math (hourly rollup, interval join, first-seen ordering)
    sees the same epoch-nanos long either way.

    Both branches are timezone-INDEPENDENT (an earlier version set
    ``spark.sql.session.timeZone=UTC`` as a hidden session-global side
    effect): ``unix_micros`` on TIMESTAMP reads the absolute instant, and
    the NTZ branch measures the wall clock against an NTZ epoch literal
    via ``timestampdiff`` — no session state consulted, none mutated."""
    if col not in df.columns:
        return df
    dtype = dict(df.dtypes)[col]
    if dtype == "timestamp":
        micros = F.unix_micros(F.col(col))
    elif dtype == "timestamp_ntz":
        micros = F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', `{col}`)"
        )
    else:
        return df
    return df.withColumn(col, (micros * 1000).cast("long"))


#: session-scoped memo of the LAZY reader DataFrames, keyed by
#: (Spark application id, resolved dir, table). `spark.read.parquet` on a
#: bare path re-runs schema inference per call — a directory listing, a
#: footer-read job, and the dtype probe in ensure_epoch_nanos — which at
#: the bench's per-query grain measured ~0.25 s PER TABLE PER RUN with
#: identical output (r13 optimization round). On a real deployment this
#: state lives in the catalog (a registered table carries its schema and
#: file index across queries; guide §6 notes Spark itself caches file
#: listings per session for exactly this reason) — reading a bare path
#: per query re-derives it from scratch every time. NOTHING is
#: materialized or cached data-side: the memoized object is the
#: unexecuted reader plan, so every action still scans the parquet
#: inputs in full. Keyed by applicationId so a new session (fresh JVM /
#: restarted context) re-infers from the files.
#:
#: Staleness caveat (r13 ADVICE): the memoized reader pins the file
#: index and inferred schema at FIRST load — files regenerated or added
#: under the same sf_dir within one Spark application are not seen (and
#: actions can fail on deleted files), where per-call spark.read.parquet
#: re-listed every time. Tests/benches that rewrite testdata in-session
#: must call :func:`invalidate_load_memo` after the rewrite.
_LOAD_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def invalidate_load_memo() -> None:
    """Drop every memoized reader so the next load() re-lists and
    re-infers from the files (see the staleness caveat on _LOAD_MEMO)."""
    _LOAD_MEMO.clear()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    try:
        # TIMESTAMP(NANOS)-generation testdata: read as long nanos
        # (runtime-settable; works on any session the caller hands us)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    import os as _os

    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir), name)
    df = _LOAD_MEMO.get(key)
    if df is None:
        df = ensure_epoch_nanos(spark, spark.read.parquet(f"{sf_dir}/{name}.parquet"))
        _LOAD_MEMO[key] = df
    return df


def mwas_input_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(run, group, quantifier) from events — runs keyed to orders."""
    ev = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders")
    # scalar "subquery" as a broadcast cross join — keeps the plan lazy
    # (no driver-side collect) and Catalyst folds it into the projection
    n_ord = orders.agg(F.max("o_orderkey").alias("n_ord"))
    return ev.crossJoin(F.broadcast(n_ord)).select(
        F.concat(F.lit("R"), (F.col("event_id") % F.col("n_ord") + 1).cast("string")).alias("run"),
        F.col("event_type").alias("group"),
        F.col("value").alias("quantifier"),
    )


def mwas_catalog_from_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bio_project, bio_sample, run, spots) from orders ⋈ customer."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.concat(F.lit("PRJ"), F.col("c_nationkey").cast("string")).alias("bio_project"),
        F.concat(F.lit("SAM"), F.col("c_custkey").cast("string")).alias("bio_sample"),
        F.concat(F.lit("R"), F.col("o_orderkey").cast("string")).alias("run"),
        (F.col("o_totalprice") * 100).cast("long").alias("spots"),
    )


def mwas_metadata_long_from_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form metadata: per bioproject (nation), biosamples (customers)
    with two attributes — mktsegment and an account-balance bucket."""
    cust = load(spark, sf_dir, "customer")
    base = cust.select(
        F.concat(F.lit("PRJ"), F.col("c_nationkey").cast("string")).alias("bioproject"),
        F.concat(F.lit("SAM"), F.col("c_custkey").cast("string")).alias("biosample_id"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.when(F.col("c_acctbal") < 0, F.lit("negative"))
        .when(F.col("c_acctbal") < 5000, F.lit("low"))
        .otherwise(F.lit("high"))
        .alias("balance_bucket"),
    )
    seg = base.select(
        "bioproject", "biosample_id",
        F.lit("mktsegment").alias("attribute"), F.lit(0).alias("attr_pos"),
        F.col("mktsegment").alias("value"),
    )
    bal = base.select(
        "bioproject", "biosample_id",
        F.lit("balance_bucket").alias("attribute"), F.lit(1).alias("attr_pos"),
        F.col("balance_bucket").alias("value"),
    )
    return seg.unionByName(bal)
