"""Bucketed co-located joins (no exchange) and salted-join equivalence."""

import pytest
from pyspark.sql import functions as F

from mwas_rfam_spark.operators.skew import salted_join
from mwas_rfam_spark.sources.bucketing import co_located_join, write_bucketed


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse dir is a static conf; bucketed tables land in the session
    # default (./spark-warehouse, gitignored)
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(left, "bk_left", ["k"], num_buckets=8, sort_cols=["k"])
    write_bucketed(right, "bk_right", ["k"], num_buckets=8, sort_cols=["k"])
    # disable auto-broadcast so the shuffle-free property is what's tested
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = co_located_join(spark, "bk_left", "bk_right", ["k"])
        plan = _physical(j)
        assert "Exchange" not in plan.replace("BroadcastExchange", "")
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain_join(spark, how):
    # skewed big side: 90% of rows share one key
    big = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame(
        [("hot", 1.0), ("lukewarm", 2.0)], ["k", "w"]
    )
    plain = big.join(small, "k", how)
    salted = salted_join(big, small, "k", salt_buckets=8, how=how)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_unsupported(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="full_outer")
