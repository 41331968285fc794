"""Regression tests for the gate instruments themselves (r13 review of
bench.py + tools/check_oracle.py — the two scripts every correctness and
performance claim flows through). Pure-Python: no SparkSession needed."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import _kind, norm_cell  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --- norm_cell: engine-neutral cell rendering ---------------------------


def test_norm_cell_negative_zero_collapses():
    """Finding: -0.0 rendered '-0' vs '0' — a red row on numerically
    equal results (sign-preserving float sum order differs by engine)."""
    assert norm_cell(-0.0) == norm_cell(0.0) == "0"


def test_norm_cell_nested_floats_get_sig_digit_tolerance():
    """Finding: floats inside arrays fell through to raw str(), so a
    1-ulp engine difference the scalar path tolerates red-rowed any
    array<double> query."""
    a = 0.1 + 0.2          # 0.30000000000000004
    b = 0.3
    assert norm_cell([a]) == norm_cell([b]) == "[0.3]"
    assert norm_cell((a, 1)) == norm_cell([b, 1])


def test_norm_cell_nested_nan_and_null():
    assert norm_cell([float("nan"), None]) == "[NaN,NULL]"


def test_norm_cell_struct_dict_sorted_by_key():
    """DuckDB structs arrive as dicts; Spark Rows expose asDict().
    Both normalize to the same key-sorted rendering."""
    assert norm_cell({"b": 2.0, "a": -0.0}) == "{a:0,b:2}"

    class FakeRow:  # pyspark Row stand-in (has asDict, isn't a dict)
        def asDict(self):
            return {"b": 2.0, "a": -0.0}

    assert norm_cell(FakeRow()) == norm_cell({"a": 0.0, "b": 2.0})


# --- _kind: width-sensitive numeric dtype buckets ------------------------


def test_kind_carries_numeric_width():
    """Finding: int32-vs-int64 collapsed into one 'int' bucket, passing
    locally while the driver's value-bytes hash differs (month() is
    IntegerType on Spark, BIGINT on DuckDB)."""
    import numpy as np
    import pandas as pd

    assert _kind(pd.Series([1], dtype=np.int32).dtype) == "int32"
    assert _kind(pd.Series([1], dtype=np.int64).dtype) == "int64"
    assert _kind(pd.Series([1.0], dtype=np.float32).dtype) == "float32"
    assert _kind(pd.Series([1.0], dtype=np.float64).dtype) == "float64"
    assert _kind(pd.Series(["x"]).dtype) == "O"


# --- compare(): multiplicity-aware O(n) values diff ----------------------


def test_compare_values_diff_shows_multiplicity():
    """Finding: the sorted-list diff was O(n^2) and printed two EMPTY
    diffs when rows differed only in multiplicity (spark=[X,X,Y] vs
    oracle=[X,Y,Y])."""
    import duckdb

    from tools.check_oracle import compare

    class FakeDF:  # minimal spark_df stand-in for the values path
        columns = ["v"]

        def collect(self):
            return [{"v": "X"}, {"v": "X"}, {"v": "Y"}]

        def limit(self, n):
            raise RuntimeError("force dtype-audit skip")

    con = duckdb.connect()
    problems = compare(
        "t", FakeDF(), con, "SELECT * FROM (VALUES ('X'), ('Y'), ('Y')) t(v)"
    )
    con.close()
    [values_problem] = [p for p in problems if p.startswith("values:")]
    # spark-only shows X with multiplicity 1, oracle-only shows Y with 1
    assert "('X',), 1" in values_problem
    assert "('Y',), 1" in values_problem


# --- CLI contracts -------------------------------------------------------


def _run_check_oracle(*args):
    return subprocess.run(
        [sys.executable, os.path.join("tools", "check_oracle.py"), *args],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        timeout=120,
    )


def test_check_oracle_rejects_unknown_query_name():
    """Finding: a typo'd query name matched nothing, ran zero
    comparisons, and printed 'OK (0 failing)' — a false green from the
    gate replica."""
    proc = _run_check_oracle("/root/testdata/sf0.001", "no_such_query_xyz")
    assert proc.returncode == 2
    assert b"unknown query name" in proc.stdout


def test_check_oracle_rejects_non_dir_first_arg():
    """Finding: `check_oracle.py dedup_exact` treated the query name as
    sf_dir and died in a raw DuckDB IOException."""
    proc = _run_check_oracle("dedup_exact")
    assert proc.returncode == 2
    assert b"must be a testdata directory" in proc.stdout


# --- bench.py artifact fields --------------------------------------------


def test_bench_sf_parses_from_trailing_suffix_only():
    """Finding: rsplit('sf') grabbed everything after ANY 'sf' in the
    path (/data/sfo/run -> 'o/run') — junk in the artifact's sf field."""
    import re

    def parse(sf_dir):  # mirrors bench.main's parse
        m = re.search(r"sf([0-9.]+)$", os.path.basename(os.path.normpath(sf_dir)))
        return m.group(1) if m else os.path.basename(os.path.normpath(sf_dir))

    assert parse("/root/testdata/sf0.1") == "0.1"
    assert parse("/root/testdata/sf0.001/") == "0.001"
    assert parse("/data/sfo/testrun") == "testrun"
    assert parse("/data/customdir") == "customdir"


def test_bench_protocol_declares_warmstart():
    """The canary's scan leg prewarms sf_dir before chunk 1; the
    protocol string must declare it so comparable_to_prev_round can't
    claim comparability across the conditions change (r8 lesson)."""
    src = open(os.path.join(REPO, "bench.py")).read()
    assert "_warmstart" in src
    assert "meminfo_cached_gb_prewarmed" in src
