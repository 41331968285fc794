"""Spark 4 Python DataSource for the reference's .mwaspkl format:
parallel per-file scan, include/exclude decode, sentinel skip."""

from __future__ import annotations

import pickle

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mwas_rfam_spark.sources.mwaspkl_source import register


def _write_mwaspkl(path, biosamples_ref, rows):
    """Build a fixture file with the reference's exact two-pickle layout
    (converter_.py:52-58): biosamples_ref list, then the set_df with
    (attributes, values, biosample_index_list, include?)."""
    set_df = pd.DataFrame(
        rows, columns=["attributes", "values", "biosample_index_list", "include?"]
    )
    with open(path, "wb") as f:
        pickle.dump(biosamples_ref, f)
        pickle.dump(set_df, f)


@pytest.fixture()
def corpus(tmp_path):
    ref_a = [f"SAMN{i:03d}" for i in range(6)]
    _write_mwaspkl(
        tmp_path / "PRJA1.mwaspkl",
        ref_a,
        [
            ("tissue", "liver", [0, 2], True),  # include-list: members 0,2
            ("tissue", "brain", [1], False),  # exclude-list: all but 1
        ],
    )
    _write_mwaspkl(
        tmp_path / "PRJB2.mwaspkl",
        ["X1", "X2"],
        [("sex", "f", [0], True)],
    )
    # one-byte sentinels: empty and blacklisted — must yield no rows
    (tmp_path / "PRJEMPTY.mwaspkl").write_bytes(b"0")
    (tmp_path / "PRJBLACK.mwaspkl").write_bytes(b"1")
    (tmp_path / "notes.txt").write_text("ignored: wrong extension")
    return tmp_path


def test_mwaspkl_scan_decodes_sets(spark, corpus):
    register(spark)
    df = spark.read.format("mwaspkl").load(str(corpus))
    rows = {
        (r["bioproject"], r["attributes"], r["set_values"]): r
        for r in df.collect()
    }
    assert len(rows) == 3
    inc = rows[("PRJA1", "tissue", "liver")]
    assert inc["biosample_ids"] == ["SAMN000", "SAMN002"]
    assert inc["n_set"] == 2 and inc["n_total"] == 6
    exc = rows[("PRJA1", "tissue", "brain")]
    # exclude-list decode: every ref member except index 1 (SO2 complement)
    assert exc["biosample_ids"] == [f"SAMN{i:03d}" for i in (0, 2, 3, 4, 5)]
    assert exc["n_set"] == 5
    assert rows[("PRJB2", "sex", "f")]["biosample_ids"] == ["X1"]


def test_mwaspkl_partition_per_file_and_pushdown(spark, corpus):
    register(spark)
    df = spark.read.format("mwaspkl").load(str(corpus))
    # one input partition per .mwaspkl file (4 files incl. sentinels)
    assert df.rdd.getNumPartitions() == 4
    # composes as a normal DataFrame: filters/aggregates downstream
    agg = (
        df.where(F.col("n_set") >= 2)
        .groupBy("bioproject")
        .agg(F.sum("n_set").alias("m"))
        .collect()
    )
    assert {(r["bioproject"], r["m"]) for r in agg} == {("PRJA1", 7)}


def test_mwaspkl_single_file_and_missing_path(spark, corpus):
    register(spark)
    one = spark.read.format("mwaspkl").load(str(corpus / "PRJB2.mwaspkl"))
    assert one.count() == 1
    with pytest.raises(Exception):
        spark.read.format("mwaspkl").load().collect()


def test_mwaspkl_empty_directory(spark, tmp_path):
    """Review r5: a directory with zero .mwaspkl files must return an
    empty DataFrame — pyspark substitutes [None] for an empty partition
    list and read(None) must yield nothing, not crash."""
    register(spark)
    empty = tmp_path / "nothing_here"
    empty.mkdir()
    df = spark.read.format("mwaspkl").load(str(empty))
    assert df.count() == 0


def test_single_file_non_mwaspkl_extension_keeps_stem(spark, tmp_path):
    """r12 review finding: the single-file branch stripped 8 chars
    blindly — a '.pkl' file got a corrupted bioproject name."""
    import pandas as pd

    p = tmp_path / "PRJA1.pkl"
    set_df = pd.DataFrame(
        {
            "attributes": ["t"],
            "values": ["x"],
            "biosample_index_list": [[0]],
            "include?": [True],
        }
    )
    with open(p, "wb") as f:
        pickle.dump(["SAMX", "SAMY"], f)
        pickle.dump(set_df, f)
    from mwas_rfam_spark.sources.mwaspkl_source import register

    register(spark)
    rows = spark.read.format("mwaspkl").load(str(p)).collect()
    assert rows and rows[0]["bioproject"] == "PRJA1"


def test_directory_scan_skips_junk_entries(spark, tmp_path):
    """r12 review finding: a stray subdirectory named *.mwaspkl used to
    crash the whole scan (IsADirectoryError inside the task)."""
    import pandas as pd

    (tmp_path / "junk.mwaspkl").mkdir()
    p = tmp_path / "PRJB2.mwaspkl"
    set_df = pd.DataFrame(
        {
            "attributes": ["t"],
            "values": ["x"],
            "biosample_index_list": [[1]],
            "include?": [True],
        }
    )
    with open(p, "wb") as f:
        pickle.dump(["SAMX", "SAMY"], f)
        pickle.dump(set_df, f)
    from mwas_rfam_spark.sources.mwaspkl_source import register

    register(spark)
    rows = spark.read.format("mwaspkl").load(str(tmp_path)).collect()
    assert [r["bioproject"] for r in rows] == ["PRJB2"]


def test_include_list_preserves_stored_order(spark, tmp_path):
    """r12 review finding: the reference decode derefs the stored index
    list AS-IS (order + duplicates); sorted(set(...)) deviated."""
    import pandas as pd

    p = tmp_path / "PRJC3.mwaspkl"
    set_df = pd.DataFrame(
        {
            "attributes": ["t"],
            "values": ["x"],
            "biosample_index_list": [[2, 0]],
            "include?": [True],
        }
    )
    with open(p, "wb") as f:
        pickle.dump(["SAMA", "SAMB", "SAMC"], f)
        pickle.dump(set_df, f)
    from mwas_rfam_spark.sources.mwaspkl_source import register

    register(spark)
    rows = spark.read.format("mwaspkl").load(str(p)).collect()
    assert rows[0]["biosample_ids"] == ["SAMC", "SAMA"]
