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


def test_zorder_layout_prunes_both_columns(spark, tmp_path):
    """Z-order clustering must make row-group min/max stats selective on
    BOTH keyed columns (verified against real parquet footers via
    pyarrow), where a single-column sort is selective on one only."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from mwas_rfam_spark.sources.layout import zorder_write

    n = 40_000
    df = spark.range(n).select(
        (F.col("id") % 200).alias("x"),
        (F.floor(F.col("id") / 200)).alias("y"),
        F.col("id").alias("payload"),
    )

    def overlap_fraction(path, col, point):
        """Fraction of row groups whose [min,max] admits col == point."""
        total = hit = 0
        for f in glob.glob(f"{path}/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            idx = meta.schema.names.index(col)
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                total += 1
                if st.min <= point <= st.max:
                    hit += 1
        assert total > 0
        return hit / total

    plain = str(tmp_path / "plain")
    # x-clustered baseline at the SAME file count (8 range files on x)
    df.repartitionByRange(8, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(plain)
    zpath = str(tmp_path / "zorder")
    zorder_write(df, ["x", "y"], zpath, n_files=8)

    # identical content
    assert (
        spark.read.parquet(zpath).agg(F.sum("payload")).collect()[0][0]
        == df.agg(F.sum("payload")).collect()[0][0]
    )

    # average over probe points (single-point fractions wobble with the
    # range-partitioner's boundary sampling)
    xs = [7, 37, 77, 117, 157, 197]
    ys = [10, 50, 90, 130, 170]

    def mean_overlap(path, col, points):
        return sum(overlap_fraction(path, col, p) for p in points) / len(points)

    # x-sorted layout: selective on x, useless on y (every group spans y)
    assert mean_overlap(plain, "x", xs) <= 0.4
    assert mean_overlap(plain, "y", ys) >= 0.9
    # z-ordered: selective on BOTH dimensions — y goes from no-pruning to
    # real pruning while x stays selective
    zx, zy = mean_overlap(zpath, "x", xs), mean_overlap(zpath, "y", ys)
    assert zx <= 0.7 and zy <= 0.7, (zx, zy)


def test_zorder_key_guards():
    import pytest
    from mwas_rfam_spark.sources.layout import zorder_key

    with pytest.raises(ValueError):
        zorder_key([], [])
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], [(0, 1)] * 4, bits=16)


def test_zorder_write_all_null_column_named_error(spark, tmp_path):
    """r13 review nit: an all-NULL keyed column used to surface as a
    bare TypeError (float(None)) inside the range math; it is a named
    ValueError at the stats gate now."""
    import pytest
    from pyspark.sql import functions as F

    from mwas_rfam_spark.sources.layout import zorder_write

    df = spark.range(10).select(
        F.col("id").alias("a"), F.lit(None).cast("double").alias("b")
    )
    with pytest.raises(ValueError, match="no non-NULL values"):
        zorder_write(df, ["a", "b"], str(tmp_path / "z"))
