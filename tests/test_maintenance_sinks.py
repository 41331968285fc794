"""Corpus-maintenance sink tests: partition-scoped upsert (only touched
partitions rewritten, data exact) and small-file compaction (file count
drops, data identical, hot partitions still split)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from mwas_rfam_spark.sources.sinks import compact_files, merge_upsert_partitioned


def _files(path):
    return {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/**/*.parquet", recursive=True)
    }


@pytest.fixture()
def base(spark, tmp_path):
    path = str(tmp_path / "corpus")
    df = spark.createDataFrame(
        [(i, f"text {i}", chr(ord("a") + i % 3)) for i in range(90)],
        ["doc_id", "text", "p"],
    )
    df.write.partitionBy("p").parquet(path)
    return path


def test_upsert_touches_only_affected_partitions(spark, base):
    before = _files(base)
    updates = spark.createDataFrame(
        [(0, "UPDATED 0", "a"), (1, "UPDATED 1", "b"), (1000, "NEW", "a")],
        ["doc_id", "text", "p"],
    )
    parts = merge_upsert_partitioned(spark, base, updates, "doc_id", "p")
    assert sorted(parts) == ["a", "b"]
    after = spark.read.parquet(base)
    assert after.count() == 91  # 90 + 1 new
    got = {r["doc_id"]: r["text"] for r in after.collect()}
    assert got[0] == "UPDATED 0" and got[1] == "UPDATED 1" and got[1000] == "NEW"
    assert got[2] == "text 2"  # untouched row intact
    # partition c's files were never rewritten
    after_files = _files(base)
    c_before = {f: t for f, t in before.items() if "/p=c/" in f}
    c_after = {f: t for f, t in after_files.items() if "/p=c/" in f}
    assert c_before == c_after
    # a and b were rewritten (different file sets)
    assert {f for f in before if "/p=a/" in f} != {
        f for f in after_files if "/p=a/" in f
    }


def test_upsert_key_collision_raises(spark, base):
    updates = spark.createDataFrame(
        [(5, "x", "a"), (5, "y", "a")], ["doc_id", "text", "p"]
    )
    with pytest.raises(ValueError):
        merge_upsert_partitioned(spark, base, updates, "doc_id", "p")


def test_compact_flat_directory(spark, tmp_path):
    path = str(tmp_path / "flat")
    df = spark.range(1000).select(F.col("id"), (F.col("id") * 2).alias("v"))
    df.repartition(50).write.parquet(path)
    assert len(_files(path)) >= 50
    compact_files(spark, path, target_rows_per_file=500)
    files = _files(path)
    assert len(files) <= 4
    out = spark.read.parquet(path)
    assert out.count() == 1000
    assert out.agg(F.sum("v")).collect()[0][0] == 999 * 1000


def test_compact_partitioned_hot_partition_splits(spark, tmp_path):
    path = str(tmp_path / "part")
    # hot partition: 900 rows in p=hot, 50 each in p=c1/c2, many files
    df = spark.createDataFrame(
        [(i, "hot" if i < 900 else ("c1" if i < 950 else "c2")) for i in range(1000)],
        ["id", "p"],
    )
    df.repartition(40).write.partitionBy("p").parquet(path)
    compact_files(spark, path, target_rows_per_file=300, partition_col="p")
    out = spark.read.parquet(path)
    assert out.count() == 1000
    assert out.where("p = 'hot'").count() == 900
    by_dir: dict = {}
    for f in _files(path):
        by_dir.setdefault(f.split("/p=")[1].split("/")[0], []).append(f)
    # cold partitions compact toward 1 file; the hot one still splits
    assert len(by_dir["c1"]) <= 2 and len(by_dir["c2"]) <= 2
    # writer-enforced cap: 900 rows at 300/file → at least 3 files
    assert 3 <= len(by_dir["hot"]) <= 8


def test_upsert_key_moves_partition(spark, base):
    """An update that changes a key's partition value must remove the
    old copy from its previous partition — otherwise the corpus holds
    the key twice (stale text in the old directory)."""
    updates = spark.createDataFrame(
        [(0, "MOVED 0", "b")], ["doc_id", "text", "p"]  # doc 0 lives in p=a
    )
    parts = merge_upsert_partitioned(spark, base, updates, "doc_id", "p")
    assert sorted(parts) == ["a", "b"]  # old home + new home both rewritten
    after = spark.read.parquet(base)
    rows = after.where("doc_id = 0").collect()
    assert len(rows) == 1
    assert rows[0]["text"] == "MOVED 0" and rows[0]["p"] == "b"
    assert after.count() == 90


def test_upsert_move_empties_partition(spark, tmp_path):
    """If every row of a partition moves away, its directory must be
    deleted — dynamic overwrite alone never rewrites a partition absent
    from the output, which would strand the stale rows."""
    path = str(tmp_path / "tiny")
    df = spark.createDataFrame(
        [(1, "one", "solo"), (2, "two", "busy"), (3, "three", "busy")],
        ["doc_id", "text", "p"],
    )
    df.write.partitionBy("p").parquet(path)
    updates = spark.createDataFrame([(1, "one moved", "busy")], ["doc_id", "text", "p"])
    merge_upsert_partitioned(spark, path, updates, "doc_id", "p")
    after = spark.read.parquet(path)
    assert after.count() == 3
    assert after.where("p = 'solo'").count() == 0
    assert {r["text"] for r in after.where("doc_id = 1").collect()} == {"one moved"}


def test_compact_returns_actual_file_count(spark, tmp_path):
    """The return value is the listed post-rewrite data-file count, in
    both the flat and partitioned paths (a global ceil(n/target) is
    wrong whenever partition_col splits the rows)."""
    flat = str(tmp_path / "flat2")
    spark.range(1000).repartition(20).write.parquet(flat)
    n = compact_files(spark, flat, target_rows_per_file=500)
    assert n == len(_files(flat))
    part = str(tmp_path / "part2")
    df = spark.createDataFrame(
        [(i, "hot" if i < 900 else ("c1" if i < 950 else "c2")) for i in range(1000)],
        ["id", "p"],
    )
    df.repartition(40).write.partitionBy("p").parquet(part)
    n = compact_files(spark, part, target_rows_per_file=300, partition_col="p")
    assert n == len(_files(part))
    assert n >= 5  # per-partition ceils: >=3 (hot) + 1 + 1 — global ceil says 4


def test_upsert_null_partition_move(spark, tmp_path):
    """ADVICE r4 (medium): a key moving OUT of the NULL partition must
    have its old row anti-joined away — isin() never matches NULL, so
    without explicit null handling the key ends up duplicated."""
    path = str(tmp_path / "nullpart")
    df = spark.createDataFrame(
        [(1, "one", None), (2, "two", None), (3, "three", "b")],
        "doc_id long, text string, p string",
    )
    df.write.partitionBy("p").parquet(path)
    updates = spark.createDataFrame(
        [(1, "one moved", "b")], "doc_id long, text string, p string"
    )
    parts = merge_upsert_partitioned(spark, path, updates, "doc_id", "p")
    assert parts == ["b", None]
    after = spark.read.parquet(path)
    rows = after.where("doc_id = 1").collect()
    assert len(rows) == 1 and rows[0]["text"] == "one moved" and rows[0]["p"] == "b"
    assert after.count() == 3
    # doc 2 stays in the null partition, untouched
    assert after.where("p IS NULL").count() == 1


def test_upsert_null_partition_emptied(spark, tmp_path):
    """When the null partition's last key moves away, its
    __HIVE_DEFAULT_PARTITION__ directory must be deleted."""
    path = str(tmp_path / "nullempty")
    df = spark.createDataFrame(
        [(1, "one", None), (2, "two", "b")],
        "doc_id long, text string, p string",
    )
    df.write.partitionBy("p").parquet(path)
    updates = spark.createDataFrame(
        [(1, "one moved", "b")], "doc_id long, text string, p string"
    )
    merge_upsert_partitioned(spark, path, updates, "doc_id", "p")
    after = spark.read.parquet(path)
    assert after.count() == 2
    assert after.where("p IS NULL").count() == 0
    assert not os.path.exists(f"{path}/p=__HIVE_DEFAULT_PARTITION__")


def test_upsert_escaped_partition_emptied(spark, tmp_path):
    """ADVICE r4: emptied-partition cleanup must build the directory
    name with Hive path escaping — a value containing ':' is written as
    'p=k%3A1', so the unescaped f-string path would never match and the
    stale rows would survive on disk."""
    path = str(tmp_path / "escpart")
    df = spark.createDataFrame(
        [(1, "one", "k:1"), (2, "two", "ok")],
        "doc_id long, text string, p string",
    )
    df.write.partitionBy("p").parquet(path)
    assert os.path.exists(f"{path}/p=k%3A1")
    updates = spark.createDataFrame(
        [(1, "one moved", "ok")], "doc_id long, text string, p string"
    )
    merge_upsert_partitioned(spark, path, updates, "doc_id", "p")
    after = spark.read.parquet(path)
    assert after.count() == 2
    assert after.where("p = 'k:1'").count() == 0
    assert not os.path.exists(f"{path}/p=k%3A1")


def test_upsert_numeric_looking_string_partitions(spark, tmp_path):
    """r12 review finding: parquet partition-type inference reads
    p='2021' back as int while updates carry the string — the mixed
    value sets used to crash sorted() with TypeError (and compare
    across types). The base is aligned to the updates' schema."""
    path = str(tmp_path / "years")
    spark.createDataFrame(
        [(1, "a", "2021"), (2, "b", "2022")],
        "doc_id long, text string, p string",
    ).write.partitionBy("p").parquet(path)
    updates = spark.createDataFrame(
        [(1, "a moved", "2022")], "doc_id long, text string, p string"
    )
    merge_upsert_partitioned(spark, path, updates, "doc_id", "p")
    after = spark.read.parquet(path)
    assert after.count() == 2
    assert after.where("doc_id = 1").collect()[0]["text"] == "a moved"
    # the key moved out of 2021 → that partition emptied and deleted
    assert not os.path.exists(f"{path}/p=2021")


def test_upsert_double_partition_emptied_dir_deleted(spark, tmp_path):
    """r12 review finding: Spark renders a double partition value with
    JVM Double.toString ('1.0E-7'); the cleanup used Python str
    ('1e-07'), never matched, and the moved key's stale row survived."""
    path = str(tmp_path / "dbl")
    spark.createDataFrame(
        [(1, "a", 1e-7), (2, "b", 0.5)], "doc_id long, text string, p double"
    ).write.partitionBy("p").parquet(path)
    assert os.path.exists(f"{path}/p=1.0E-7")
    updates = spark.createDataFrame(
        [(1, "a moved", 0.5)], "doc_id long, text string, p double"
    )
    merge_upsert_partitioned(spark, path, updates, "doc_id", "p")
    after = spark.read.parquet(path)
    assert after.count() == 2  # no duplicate of doc_id 1
    assert after.where("doc_id = 1").count() == 1
    assert not os.path.exists(f"{path}/p=1.0E-7")


def test_upsert_null_key_raises(spark, base):
    """r12 review finding: a NULL-key update can never match the
    anti-join — it would duplicate instead of replace; refuse."""
    updates = spark.createDataFrame(
        [(None, "ghost", "a")], "doc_id long, text string, p string"
    )
    with pytest.raises(ValueError, match="NULL"):
        merge_upsert_partitioned(spark, base, updates, "doc_id", "p")


def test_compact_includes_null_partition(spark, tmp_path):
    """r12 review finding: the plain equi-join with the per-partition
    counts silently excluded NULL-partition rows from compaction."""
    path = str(tmp_path / "nullpart")
    spark.createDataFrame(
        [(i, f"t{i}", None if i % 2 else "a") for i in range(40)],
        "doc_id long, text string, p string",
    ).repartition(8).write.partitionBy("p").parquet(path)
    before = sorted(
        r["doc_id"] for r in spark.read.parquet(path).collect()
    )
    n_before = len(glob.glob(
        f"{path}/p=__HIVE_DEFAULT_PARTITION__/*.parquet"
    ))
    assert n_before > 1
    compact_files(spark, path, target_rows_per_file=100, partition_col="p")
    after = sorted(r["doc_id"] for r in spark.read.parquet(path).collect())
    assert after == before
    n_after = len(glob.glob(
        f"{path}/p=__HIVE_DEFAULT_PARTITION__/*.parquet"
    ))
    assert n_after == 1


def test_compact_flat_refuses_partitioned_dir(spark, tmp_path):
    """r12 review finding: compacting a partitioned directory without
    partition_col would silently flatten the layout — refuse."""
    path = str(tmp_path / "part")
    spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "doc_id long, text string, p string"
    ).write.partitionBy("p").parquet(path)
    with pytest.raises(ValueError, match="partitioned"):
        compact_files(spark, path, target_rows_per_file=10)


def test_hive_partition_dir_matches_spark_writer_exotic_types(spark, tmp_path):
    """r13 review finding: the partition-dir rendering mismatched
    Spark's writer for small decimals (format(...,'f') wrote
    '0.00000001' where Spark writes '1E-8'), booleans (str(True) is
    'True', Spark writes 'true') and fractional timestamps (str pads
    microseconds, Spark trims trailing zeros) — each mismatch leaves an
    emptied partition dir undeleted and its moved keys duplicated. Gold
    test: whatever directory Spark's writer creates, the renderer must
    name."""
    import datetime
    import os
    from decimal import Decimal

    from mwas_rfam_spark.sources.sinks import _hive_partition_dir

    cases = [
        ("cast(1e-8 as decimal(20,12))", Decimal("1E-8").scaleb(0)),
        ("cast(0.5 as decimal(10,2))", Decimal("0.50")),
        ("true", True),
        ("cast('2024-01-02 03:04:05.001' as timestamp)", datetime.datetime(2024, 1, 2, 3, 4, 5, 1000)),
        ("cast('2024-01-02 03:04:05' as timestamp)", datetime.datetime(2024, 1, 2, 3, 4, 5)),
    ]
    for i, (sql_val, _py) in enumerate(cases):
        out = str(tmp_path / f"part_{i}")
        df = spark.sql(f"SELECT 1 AS x, {sql_val} AS p")
        df.write.partitionBy("p").parquet(out)
        [dirname] = [
            d for d in os.listdir(out)
            if d.startswith("p=") and not d.startswith("_")
        ]
        py_val = df.first()["p"]
        got = _hive_partition_dir(spark, "p", py_val)
        # compare unescaped-equivalence: the dir on disk is escaped by
        # the same rule _hive_partition_dir applies
        assert got == dirname, (
            f"value {py_val!r}: renderer says {got!r}, Spark wrote {dirname!r}"
        )
