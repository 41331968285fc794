"""SQL API surface (J5 — reference old/mwas_rfam.py:563-608 runs raw SQL
joins server-side; here the engine exposes the same capability through
Spark SQL over registered views).

``register_views`` makes the testdata tables queryable by name so any
ANSI query the reference's users run against their Postgres export runs
verbatim on the engine — Catalyst applies the same pushdown/pruning as
the DataFrame API (SQL and DataFrame compile to identical plans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    from mwas_rfam_spark.plans.testdata_mwas import load

    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


def sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """Run a raw SQL query; optionally (re)register the testdata views."""
    if sf_dir is not None:
        register_views(spark, sf_dir)
    return spark.sql(query)
