"""As-of join: hand-verified semantics plus cross-engine parity against
DuckDB's native ASOF JOIN over the same parquet."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mwas_rfam_spark.operators.interval import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("u1", 100, "a"), ("u1", 205, "b"), ("u1", 50, "c"), ("u2", 100, "d")],
        "k string, ts long, ev string",
    )
    right = spark.createDataFrame(
        [("u1", 100, 1.0), ("u1", 200, 2.0), ("u2", 300, 3.0)],
        "k string, ts long, px double",
    )
    out = {
        (r["k"], r["ts"]): (r["px_r"], r["ts_r"])
        for r in asof_join(left, right, by="k").collect()
    }
    assert out[("u1", 100)] == (1.0, 100)   # inclusive: equal ts matches
    assert out[("u1", 205)] == (2.0, 200)   # greatest earlier
    assert out[("u1", 50)] == (None, None)  # nothing earlier
    assert out[("u2", 100)] == (None, None) # per-group isolation

    fwd = {
        (r["k"], r["ts"]): (r["px_r"], r["ts_r"])
        for r in asof_join(left, right, by="k", direction="forward").collect()
    }
    assert fwd[("u1", 50)] == (1.0, 100)
    assert fwd[("u1", 205)] == (None, None)
    assert fwd[("u2", 100)] == (3.0, 300)

    tol = {
        (r["k"], r["ts"]): r["px_r"]
        for r in asof_join(left, right, by="k", tolerance=10).collect()
    }
    assert tol[("u1", 100)] == 1.0 and tol[("u1", 205)] == 2.0
    assert tol[("u2", 100)] is None

    with pytest.raises(ValueError):
        asof_join(left, right, direction="sideways")
    with pytest.raises(ValueError):
        asof_join(left, right, tolerance=-1)


def test_asof_join_matches_duckdb(spark, sf_dir):
    """Most-recent-prior-error-per-user over the events table must agree
    with DuckDB's native ASOF JOIN row for row."""
    from mwas_rfam_spark.plans.testdata_mwas import load

    ev = load(spark, sf_dir, "events")  # ts normalized to epoch nanos
    errors = (
        ev.where(F.col("event_type") == "error")
        # unique (user_id, ts) for deterministic tie handling
        .groupBy("user_id", "ts").agg(F.max("value").alias("err_value"))
    )
    got = {
        r["event_id"]: (r["err_value_r"], r["ts_r"])
        for r in asof_join(
            ev.select("event_id", "user_id", "ts"),
            errors,
            by="user_id",
        ).collect()
    }

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW ev AS SELECT event_id, user_id, "
        f"epoch_us(ts) * 1000 AS ts, event_type, value "
        f"FROM '{sf_dir}/events.parquet'"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            """
            WITH errors AS (
              SELECT user_id, ts, max(value) AS err_value
              FROM ev WHERE event_type = 'error' GROUP BY 1, 2)
            SELECT l.event_id, e.err_value, e.ts
            FROM ev l ASOF LEFT JOIN errors e
              ON l.user_id = e.user_id AND l.ts >= e.ts
            """
        ).fetchall()
    }
    assert len(got) == len(want) > 0
    assert got == want
    # non-vacuous: some rows matched and some did not
    assert any(v[0] is not None for v in got.values())
    assert any(v[0] is None for v in got.values())


def test_asof_join_matches_pandas_randomized(spark):
    """Randomized cross-check against pandas.merge_asof (the reference
    implementation of as-of semantics), both directions, with and
    without tolerance, over several seeds."""
    import numpy as np
    import pandas as pd

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        left_pd = pd.DataFrame({
            "k": rng.integers(0, 4, 60),
            "ts": rng.choice(np.arange(0, 500), 60, replace=False).astype("int64"),
        })
        right_pd = pd.DataFrame({
            "k": rng.integers(0, 4, 40),
            "ts": rng.choice(np.arange(0, 500), 40, replace=False).astype("int64"),
        })
        right_pd["v"] = rng.normal(size=40).round(6)
        left = spark.createDataFrame(left_pd.assign(lid=np.arange(60)))
        right = spark.createDataFrame(right_pd)

        for direction, tol in [("backward", None), ("forward", None),
                               ("backward", 50), ("forward", 30)]:
            want_pd = pd.merge_asof(
                left_pd.assign(lid=np.arange(60)).sort_values("ts"),
                right_pd.sort_values("ts"),
                on="ts", by="k", direction=direction,
                tolerance=tol if tol is None else int(tol),
            )
            want = {
                int(r.lid): (None if pd.isna(r.v) else round(float(r.v), 6))
                for r in want_pd.itertuples()
            }
            got = {
                int(r["lid"]): (None if r["v_r"] is None else round(r["v_r"], 6))
                for r in asof_join(left, right, by="k", direction=direction,
                                   tolerance=tol).collect()
            }
            assert got == want, (seed, direction, tol)


def test_sessionize_gap_rule(spark):
    """Events split into sessions exactly at gaps > gap; boundaries at
    == gap stay in-session; per-key independence."""
    import pytest
    from pyspark.sql import functions as F

    from mwas_rfam_spark.operators.interval import session_summaries, sessionize

    rows = [
        (1, 0), (1, 10), (1, 20),      # session 0 (gaps 10 == gap kept)
        (1, 31),                       # gap 11 > 10 -> session 1
        (1, 100),                      # session 2
        (2, 5),                        # other key, own session 0
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts long")
    got = {(r["user_id"], r["ts"]): r["session_seq"]
           for r in sessionize(ev, gap=10).collect()}
    assert got == {(1, 0): 0, (1, 10): 0, (1, 20): 0,
                   (1, 31): 1, (1, 100): 2, (2, 5): 0}

    summ = {(r["user_id"], r["session_seq"]):
            (r["session_start"], r["session_end"], r["n_events"], r["duration"])
            for r in session_summaries(ev, gap=10).collect()}
    assert summ[(1, 0)] == (0, 20, 3, 20)
    assert summ[(1, 2)] == (100, 100, 1, 0)
    assert summ[(2, 0)] == (5, 5, 1, 0)

    with pytest.raises(ValueError):
        sessionize(ev, gap=0)


def test_sessionize_duckdb_parity(spark, sf_dir):
    """Session summaries over the real events table match an independent
    DuckDB lag/cumsum formulation (30-minute gap on the epoch-micros
    timeline)."""
    import duckdb
    from pyspark.sql import functions as F

    from mwas_rfam_spark.operators.interval import session_summaries
    from mwas_rfam_spark.plans.testdata_mwas import ensure_epoch_nanos

    ev = ensure_epoch_nanos(
        spark, spark.read.parquet(f"{sf_dir}/events.parquet"), "ts"
    ).select("user_id", "ts")
    gap = 30 * 60 * 1_000_000_000  # 30 min in nanos
    got = sorted(
        (r["user_id"], r["session_seq"], r["session_start"], r["session_end"],
         r["n_events"], r["duration"])
        for r in session_summaries(ev, gap=gap).collect()
    )
    con = duckdb.connect()
    want = sorted(con.sql(f"""
        WITH t AS (
          SELECT user_id, epoch_ns(ts) AS ts FROM read_parquet('{sf_dir}/events.parquet')
        ), flagged AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER w > {gap} THEN 1 ELSE 0 END AS f
          FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sess AS (
          SELECT user_id, ts,
                 sum(f) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS seq
          FROM flagged
        )
        SELECT user_id, seq, min(ts), max(ts), count(*), max(ts)-min(ts)
        FROM sess GROUP BY user_id, seq
    """).fetchall())
    assert got == [tuple(r) for r in want] and len(got) > 0


def test_sessionize_randomized_reference_model(spark):
    """Randomized cross-check: session count and assignment per key
    match a sequential scan over sorted timestamps (3 seeded draws,
    duplicate timestamps included)."""
    import random

    from mwas_rfam_spark.operators.interval import sessionize

    for seed in (3, 17, 91):
        rnd = random.Random(seed)
        gap = rnd.randint(2, 10)
        rows = [
            (u, rnd.randint(0, 60))
            for u in range(1, 6)
            for _ in range(rnd.randint(1, 20))
        ]
        want = {}
        by_user: dict = {}
        for u, t in rows:
            by_user.setdefault(u, []).append(t)
        for u, ts in by_user.items():
            ts.sort()
            seq = 0
            prev = None
            for t in ts:
                if prev is not None and t - prev > gap:
                    seq += 1
                want[(u, t)] = seq  # ties share a session by definition
                prev = t

        sdf = spark.createDataFrame(rows, "user_id long, ts long")
        got = {
            (r["user_id"], r["ts"]): r["session_seq"]
            for r in sessionize(sdf, gap=gap).collect()
        }
        assert got == want, f"seed={seed} gap={gap}"
