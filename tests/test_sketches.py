"""Count-min sketch: one-sided guarantee, merge == one-pass, weighted
counts, and bit-exact DuckDB replay of the sketch CONTENT (md5-derived
buckets are engine-independent)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mwas_rfam_spark.operators.sketches import cms_build, cms_lookup, cms_merge

W, D, SEED = 256, 4, 7


def _truth(rows):
    t = {}
    for k in rows:
        t[k] = t.get(k, 0) + 1
    return t


@pytest.fixture(scope="module")
def stream(spark):
    # zipf-ish: key i appears ~ 600/i times, plus a long tail of singletons
    rows = []
    for i in range(1, 30):
        rows += [f"hot{i}"] * (600 // i)
    rows += [f"tail{i}" for i in range(400)]
    return spark.createDataFrame([(k,) for k in rows], "key string").cache()


def test_cms_guarantee_and_exactness_on_hot_keys(spark, stream):
    truth = _truth([r["key"] for r in stream.collect()])
    n = sum(truth.values())
    sketch = cms_build(stream, "key", width=W, depth=D, seed=SEED).cache()
    assert sketch.count() <= W * D
    keys = spark.createDataFrame([(k,) for k in truth], "key string")
    est = {
        r["key"]: r["est"]
        for r in cms_lookup(sketch, keys, "key", width=W, depth=D, seed=SEED).collect()
    }
    over = 0
    for k, true in truth.items():
        assert est[k] >= true  # one-sided: never undercounts
        assert est[k] <= true + 10 * n / W  # loose whp bound, deterministic here
        if est[k] > true:
            over += 1
    # with 428 distinct keys into 256 buckets there ARE collisions
    assert over > 0
    # an absent key still gets an estimate (possibly > 0 via collisions)
    ghost = spark.createDataFrame([("never-seen",)], "key string")
    g = cms_lookup(sketch, ghost, "key", width=W, depth=D, seed=SEED).collect()[0]
    assert g["est"] >= 0


def test_cms_merge_equals_one_pass(spark, stream):
    a = stream.where(F.length("key") % 2 == 0)
    b = stream.where(F.length("key") % 2 == 1)
    merged = cms_merge(
        cms_build(a, "key", width=W, depth=D, seed=SEED),
        cms_build(b, "key", width=W, depth=D, seed=SEED),
    )
    whole = cms_build(stream, "key", width=W, depth=D, seed=SEED)
    got = sorted(map(tuple, merged.collect()))
    want = sorted(map(tuple, whole.collect()))
    assert got == want


def test_cms_weighted_and_null_keys(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 3), ("b", 2), (None, 100)], "key string, w int"
    )
    sk = cms_build(df, "key", width=64, depth=3, seed=1, weight_col="w")
    est = {
        r["key"]: r["est"]
        for r in cms_lookup(
            sk, df.select("key"), "key", width=64, depth=3, seed=1
        ).collect()
    }
    assert est["a"] >= 8 and est["b"] >= 2
    assert None not in est  # null keys dropped on both sides
    # total mass excludes the null row's weight entirely
    per_depth = sk.groupBy("depth").agg(F.sum("cnt").alias("m")).collect()
    assert all(r["m"] == 10 for r in per_depth)
    with pytest.raises(ValueError, match="width/depth"):
        cms_build(df, "key", width=0)
    # the JVM fast path and a depth > 4 sketch (second digest group)
    for h, dep in (("xxhash64", 3), ("md5", 6)):
        sk2 = cms_build(df, "key", width=64, depth=dep, seed=1, hash=h)
        est2 = {
            r["key"]: r["est"]
            for r in cms_lookup(
                sk2, df.select("key"), "key", width=64, depth=dep, seed=1, hash=h
            ).collect()
        }
        assert est2["a"] >= 2 and est2["b"] >= 1  # unweighted row counts
    with pytest.raises(ValueError, match="hash"):
        cms_build(df, "key", hash="sha9000")


def test_cms_duckdb_replay(spark, sf_dir):
    """The sketch RELATION itself replays bit-for-bit in SQL: md5
    buckets are engine-independent, so DuckDB building the same sketch
    over the same corpus produces identical (depth, bucket, cnt) rows."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("source").alias("key")
    )
    got = sorted(
        map(tuple, cms_build(docs, "key", width=128, depth=3, seed=2).collect())
    )
    con = duckdb.connect()
    want = sorted(
        con.execute(f"""
        WITH d AS (SELECT source AS key
                   FROM read_parquet('{sf_dir}/documents.parquet')
                   WHERE source IS NOT NULL),
        rows AS (
          -- depth d's bucket is the d-th 8-hex-char slice of ONE digest
          -- (digest group g = d // 4; all three depths share group 0)
          SELECT g.g AS depth,
                 CAST(CAST(('0x' || substr(md5('cms:2:0:' || key),
                                           1 + 8 * g.g, 8)) AS UBIGINT)
                      % 128 AS INT) AS bucket
          FROM d, unnest(range(3)) AS g(g))
        SELECT CAST(depth AS INT), bucket, count(*) AS cnt
        FROM rows GROUP BY 1, 2
    """).fetchall()
    )
    con.close()
    assert got == want and len(got) > 0


def test_cms_fractional_weights_exact(spark):
    """Review regression: fractional weights must sum exactly (cnt is
    DOUBLE under weight_col) — a per-row integer cast would store 0 for
    0.5-weight rows and break the one-sided est >= true guarantee."""
    df = spark.createDataFrame(
        [("a", 0.5), ("a", 0.5), ("a", 0.5), ("a", 0.5), ("b", 0.25)],
        "key string, w double",
    )
    sk = cms_build(df, "key", width=64, depth=3, seed=4, weight_col="w")
    est = {
        r["key"]: r["est"]
        for r in cms_lookup(
            sk, df.select("key"), "key", width=64, depth=3, seed=4
        ).collect()
    }
    assert est["a"] >= 2.0 and est["b"] >= 0.25


def test_cms_lookup_validates_width_depth(spark):
    """r12 review finding: cms_lookup lacked cms_build's guard — a
    depth=0 lookup silently returned an empty relation and width=0
    threw DIVIDE_BY_ZERO mid-job under ANSI."""
    sketch = cms_build(
        spark.createDataFrame([("a",)], ["key"]), "key", width=8, depth=2
    )
    keys = spark.createDataFrame([("a",)], ["key"])
    with pytest.raises(ValueError, match="width/depth"):
        cms_lookup(sketch, keys, "key", width=8, depth=0)
    with pytest.raises(ValueError, match="width/depth"):
        cms_lookup(sketch, keys, "key", width=0, depth=2)


def test_cms_lookup_preserves_key_type(spark):
    """r12 review finding: the estimate relation's key column came back
    cast to string, breaking typed joins back to the probe relation."""
    df = spark.createDataFrame([(42,), (42,), (7,)], "key long")
    sketch = cms_build(df, "key", width=64, depth=3, seed=1)
    out = cms_lookup(sketch, df, "key", width=64, depth=3, seed=1)
    assert dict(out.dtypes)["key"] == "bigint"
    got = {r["key"]: r["est"] for r in out.collect()}
    assert got[42] >= 2 and got[7] >= 1


def test_cms_build_null_weight_rows_excluded(spark):
    """r12 review finding: NULL-weight rows were dropped by SUM's
    NULL-skip as an undocumented accident; now explicitly filtered —
    same estimates, pinned semantics."""
    df = spark.createDataFrame(
        [("a", 2.0), ("a", None), ("b", 1.5)], "key string, w double"
    )
    sketch = cms_build(df, "key", width=64, depth=3, seed=2, weight_col="w")
    keys = spark.createDataFrame([("a",), ("b",)], ["key"])
    got = {
        r["key"]: r["est"]
        for r in cms_lookup(sketch, keys, "key", width=64, depth=3, seed=2).collect()
    }
    assert got["a"] >= 2.0 and got["b"] >= 1.5
    # total mass excludes the NULL-weight row exactly
    total = sketch.groupBy("depth").sum("cnt").collect()
    assert all(abs(r["sum(cnt)"] - 3.5) < 1e-12 for r in total)
