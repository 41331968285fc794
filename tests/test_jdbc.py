"""S3 JDBC catalog path, end-to-end against embedded Apache Derby.

The reference queries Postgres with a hand-built ``WHERE acc IN (...)``
(mg:163-184); our `catalog_from_jdbc` delegates the same filtering to
Spark's JDBC source, which pushes predicates into the database. The
Derby jars ship inside the PySpark distribution (pyspark/jars/derby*),
so this exercises the REAL JDBC round-trip — write a catalog table over
JDBC, read it back through `catalog_from_jdbc`, and verify both the
values and the pushed-down predicate — with no external service.
"""

from __future__ import annotations

import pytest


DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """Embedded Derby database seeded with a 4-run catalog table.

    Derby is single-JVM, which matches local-mode Spark (driver and
    executors share the process). `derby.system.home` is pointed at the
    pytest tmp dir BEFORE first use so the engine roots its databases
    and derby.log there instead of the repo cwd.
    """
    home = tmp_path_factory.mktemp("derby")
    spark._jvm.System.setProperty("derby.system.home", str(home))
    url = "jdbc:derby:catalogdb;create=true"

    rows = [
        ("RUN1", "PRJ1", "SAMN01", 1000),
        ("RUN2", "PRJ1", "SAMN01", 2000),
        ("RUN3", "PRJ2", "SAMN02", 3000),
        ("RUN4", "PRJ2", "SAMN03", 4000),
    ]
    df = spark.createDataFrame(
        rows, "run string, bio_project string, bio_sample string, spots long"
    )
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "catalog")
        .option("driver", DRIVER)
        # Derby's default mapping for StringType is CLOB, which the engine
        # refuses to compare against literals — so pushed-down predicates
        # would fail server-side. Real catalogs use VARCHAR accessions.
        .option(
            "createTableColumnTypes",
            "run VARCHAR(64), bio_project VARCHAR(64), bio_sample VARCHAR(64)",
        )
        .mode("overwrite")
        .save()
    )
    return url


def test_jdbc_catalog_round_trip(spark, derby_url):
    """Values written over JDBC come back intact via catalog_from_jdbc."""
    from mwas_rfam_spark.sources.readers import catalog_from_jdbc

    cat = catalog_from_jdbc(spark, derby_url, "catalog", {"driver": DRIVER})
    got = sorted(
        (r["run"], r["bio_project"], r["bio_sample"], r["spots"])
        for r in cat.collect()
    )
    assert got == [
        ("RUN1", "PRJ1", "SAMN01", 1000),
        ("RUN2", "PRJ1", "SAMN01", 2000),
        ("RUN3", "PRJ2", "SAMN02", 3000),
        ("RUN4", "PRJ2", "SAMN03", 4000),
    ]


def test_jdbc_in_list_pushdown(spark, derby_url):
    """The reference's `WHERE acc IN (...)` shape: an isin filter on the
    JDBC frame is pushed into Derby (PushedFilters in the scan node),
    not evaluated in Spark after a full-table fetch."""
    from pyspark.sql import functions as F

    from mwas_rfam_spark.sources.readers import catalog_from_jdbc

    cat = catalog_from_jdbc(spark, derby_url, "catalog", {"driver": DRIVER})
    wanted = cat.where(F.col("run").isin("RUN1", "RUN4"))
    assert {r["run"] for r in wanted.collect()} == {"RUN1", "RUN4"}

    plan = wanted._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(run" in plan.replace('"', ""), plan


def test_jdbc_derived_spots(spark, derby_url):
    """S4 derived column over JDBC: a table carrying raw mbases/avgspotlen
    instead of spots gets spots derived on read (reference mg:47)."""
    from mwas_rfam_spark.sources.readers import catalog_from_jdbc

    raw = spark.createDataFrame(
        [("RUN9", "PRJ9", "SAMN09", 150, 300)],
        "run string, bio_project string, bio_sample string, mbases long, avgspotlen long",
    )
    (
        raw.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "catalog_raw")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    cat = catalog_from_jdbc(spark, derby_url, "catalog_raw", {"driver": DRIVER})
    row = cat.collect()[0]
    assert row["spots"] == 150 * 1_000_000 // 300
