"""Data-selection operator tests: DuckDB cross-engine parity for the
DSIR importance weights and the Gumbel-top-k selection (both are
deterministic md5-keyed relational plans, so the oracle replays them
exactly), hand-model checks for the linear scorer, enrichment and
determinism properties, and cluster-balanced sampling invariants."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from mwas_rfam_spark.operators.selection import (
    hashed_ngram_features,
    importance_resample,
    importance_weights,
    score_quality_linear,
)

N_BUCKETS, ALPHA = 512, 1.0

# the operator's exact relational semantics in DuckDB SQL: lowercased
# whitespace tokens, unigrams + bigrams, bucket = md5-prefix-32 mod B,
# add-alpha smoothed log ratio target/raw summed per raw doc
_WEIGHTS_SQL = f"""
WITH toks AS (
  SELECT doc_id, side, list_filter(
           string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '') AS t
  FROM corpus),
grams AS (
  SELECT doc_id, side, unnest(t) AS gram FROM toks
  UNION ALL
  SELECT doc_id, side,
         unnest(list_transform(range(1, greatest(len(t), 1)),
                i -> t[i] || ' ' || t[i+1])) AS gram
  FROM toks WHERE len(t) >= 2),
feats AS (
  SELECT doc_id, side,
         CAST('0x' || substr(md5(gram), 1, 8) AS BIGINT) % {N_BUCKETS}
             AS bucket,
         count(*) AS cnt
  FROM grams GROUP BY 1, 2, 3),
q AS (SELECT bucket, sum(cnt) AS c FROM feats WHERE side = 'raw' GROUP BY 1),
p AS (SELECT bucket, sum(cnt) AS c FROM feats WHERE side = 'tgt' GROUP BY 1),
tot AS (SELECT (SELECT coalesce(sum(c), 0) FROM q) AS tq,
               (SELECT coalesce(sum(c), 0) FROM p) AS tp),
ratio AS (
  SELECT q.bucket,
         ln((coalesce(p.c, 0) + {ALPHA}) / (tot.tp + {ALPHA} * {N_BUCKETS}))
       - ln((q.c + {ALPHA}) / (tot.tq + {ALPHA} * {N_BUCKETS})) AS logratio
  FROM q LEFT JOIN p ON q.bucket = p.bucket CROSS JOIN tot),
perdoc AS (
  SELECT f.doc_id, sum(f.cnt * r.logratio) AS log_weight
  FROM feats f JOIN ratio r ON f.bucket = r.bucket
  WHERE f.side = 'raw' GROUP BY 1)
SELECT c.doc_id, round(coalesce(w.log_weight, 0.0), 8) AS log_weight
FROM (SELECT doc_id FROM corpus WHERE side = 'raw') c
LEFT JOIN perdoc w USING (doc_id)
"""


@pytest.fixture(scope="module")
def split_docs(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    raw = d.where(F.col("doc_id") % 7 != 0)
    tgt = d.where(F.col("doc_id") % 7 == 0)
    return raw, tgt


def test_weights_match_duckdb(spark, sf_dir, split_docs):
    raw, tgt = split_docs
    got = {
        r["doc_id"]: round(r["log_weight"], 8)
        for r in importance_weights(raw, tgt, n_buckets=N_BUCKETS, alpha=ALPHA).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"""CREATE VIEW corpus AS
        SELECT doc_id, text, CASE WHEN doc_id % 7 = 0 THEN 'tgt' ELSE 'raw' END AS side
        FROM '{sf_dir}/documents.parquet'"""
    )
    want = {r[0]: r[1] for r in con.sql(_WEIGHTS_SQL).fetchall()}
    assert len(got) == len(want) > 0
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6), k


def test_resample_matches_duckdb_topk(spark, sf_dir, split_docs):
    """The full Gumbel-top-k selection replays in SQL: same md5-decoded
    uniform, same key, same k rows in the same order."""
    raw, tgt = split_docs
    sel = importance_resample(
        raw, tgt, k=20, seed=42, n_buckets=N_BUCKETS, alpha=ALPHA
    ).select("doc_id", "selection_key")
    got = [(r["doc_id"], round(r["selection_key"], 6)) for r in sel.collect()]
    con = duckdb.connect()
    con.sql(
        f"""CREATE VIEW corpus AS
        SELECT doc_id, text, CASE WHEN doc_id % 7 = 0 THEN 'tgt' ELSE 'raw' END AS side
        FROM '{sf_dir}/documents.parquet'"""
    )
    want = con.sql(
        f"""
        WITH w AS ({_WEIGHTS_SQL}),
        keyed AS (
          SELECT doc_id,
                 log_weight - ln(-ln(
                   (CAST('0x' || substr(md5('dsir:42:' || CAST(doc_id AS VARCHAR)), 1, 8)
                         AS BIGINT) + 0.5) / 4294967296.0)) AS selection_key
          FROM w)
        SELECT doc_id, round(selection_key, 6) FROM keyed
        ORDER BY selection_key DESC, doc_id ASC LIMIT 20
        """
    ).fetchall()
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-5)


def test_weights_enrich_target_like_docs(spark):
    """Synthetic sanity: raw docs that share the target's vocabulary get
    higher weights than off-topic docs, and the resampled set at low
    temperature is dominated by them."""
    tgt = spark.createDataFrame(
        [(i, "solar panels generate clean energy from sunlight") for i in range(20)],
        ["doc_id", "text"],
    )
    raw = spark.createDataFrame(
        [(i, "solar energy from panels in sunlight") for i in range(30)]
        + [(100 + i, "recipe for chocolate cake with butter and eggs") for i in range(30)],
        ["doc_id", "text"],
    )
    w = {r["doc_id"]: r["log_weight"] for r in importance_weights(raw, tgt).collect()}
    on_topic = [w[i] for i in range(30)]
    off_topic = [w[100 + i] for i in range(30)]
    assert min(on_topic) > max(off_topic)
    sel = importance_resample(raw, tgt, k=25, seed=1, temperature=0.05)
    ids = {r["doc_id"] for r in sel.collect()}
    assert sum(1 for i in ids if i < 100) >= 24  # ≥24/25 from the on-topic half


def test_resample_determinism_and_seed_sensitivity(spark, split_docs):
    raw, tgt = split_docs
    a = [r["doc_id"] for r in importance_resample(raw, tgt, k=10, seed=7).collect()]
    b = [r["doc_id"] for r in importance_resample(raw, tgt, k=10, seed=7).collect()]
    c = [r["doc_id"] for r in importance_resample(raw, tgt, k=10, seed=8).collect()]
    assert a == b
    assert a != c  # different seed reshuffles the Gumbel keys


def test_empty_docs_weight_zero(spark):
    tgt = spark.createDataFrame([(1, "some target text")], ["doc_id", "text"])
    raw = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "some raw text")], ["doc_id", "text"]
    )
    w = {r["doc_id"]: r["log_weight"] for r in importance_weights(raw, tgt).collect()}
    assert w[1] == 0.0 and w[2] == 0.0
    assert len(w) == 3


def test_linear_scorer_hand_model(spark):
    """One feature per token with a hand-built weight vector: score must
    equal sigmoid(bias + mean weight) computed by hand."""
    docs = spark.createDataFrame(
        [(1, "good good"), (2, "bad"), (3, "good bad"), (4, "")],
        ["doc_id", "text"],
    )
    feats = hashed_ngram_features(docs, n_buckets=N_BUCKETS, bigrams=False)
    buckets = {
        r["doc_id"]: r["bucket"]
        for r in feats.where(F.col("cnt") >= 1).collect()
        if r["doc_id"] in (1, 2)
    }
    b_good, b_bad = buckets[1], buckets[2]
    assert b_good != b_bad
    weights = spark.createDataFrame(
        [(b_good, 2.0), (b_bad, -2.0)], ["bucket", "weight"]
    )
    got = {
        r["doc_id"]: r["score"]
        for r in score_quality_linear(
            docs, weights, bias=0.5, n_buckets=N_BUCKETS, bigrams=False
        ).collect()
    }
    sig = lambda x: 1.0 / (1.0 + math.exp(-x))
    assert got[1] == pytest.approx(sig(0.5 + 2.0))  # mean of (2,2)
    assert got[2] == pytest.approx(sig(0.5 - 2.0))
    assert got[3] == pytest.approx(sig(0.5 + 0.0))  # mean of (2,-2)
    assert got[4] == pytest.approx(sig(0.5))  # featureless → bias only


def test_linear_scorer_threshold_gate(spark):
    docs = spark.createDataFrame([(1, "x"), (2, "y")], ["doc_id", "text"])
    weights = spark.createDataFrame([], "bucket INT, weight DOUBLE")
    out = score_quality_linear(docs, weights, bias=0.0, threshold=0.5)
    rows = {r["doc_id"]: r["keep"] for r in out.collect()}
    assert rows == {1: True, 2: True}  # sigmoid(0) = 0.5 >= 0.5


def test_cluster_balanced_sample(spark, sf_dir):
    from mwas_rfam_spark.operators.similarity import (
        cluster_balanced_sample,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = train_ivf_centroids(emb, k=4, iters=3)
    out = cluster_balanced_sample(emb, cents, per_cluster=5, vec_col="embedding")
    per_cell = {
        r["cell"]: r["n"]
        for r in out.groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    assert all(n <= 5 for n in per_cell.values())
    assert sum(per_cell.values()) == out.count()
    # deterministic: same centroids + data → identical sample
    again = cluster_balanced_sample(emb, cents, per_cluster=5, vec_col="embedding")
    assert sorted(r["vec_id"] for r in out.collect()) == sorted(
        r["vec_id"] for r in again.collect()
    )


def test_bad_params_raise(spark):
    d = spark.createDataFrame([(1, "t")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        hashed_ngram_features(d, n_buckets=1)
    with pytest.raises(ValueError):
        importance_resample(d, d, k=0)
    with pytest.raises(ValueError):
        importance_resample(d, d, k=1, temperature=0.0)
    with pytest.raises(ValueError):
        importance_weights(d, d, alpha=0.0)


def test_hash_split_deterministic_and_partitioned(spark):
    from mwas_rfam_spark.plans.sampling import hash_split

    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=5)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 10_000  # exactly one label per row
    assert 7600 <= counts["train"] <= 8400  # binomial around 8000
    assert 800 <= counts["val"] <= 1250 and 800 <= counts["test"] <= 1250
    # deterministic across invocations; seed changes the assignment
    again = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=5)
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in again.collect()}
    assert a == b
    other = hash_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=6)
    c = {r["doc_id"]: r["split"] for r in other.collect()}
    assert a != c
    # growing train at the same seed never evicts a train row
    grown = hash_split(df, {"train": 0.9, "test": 0.1}, seed=5)
    g = {r["doc_id"]: r["split"] for r in grown.collect()}
    assert all(g[k] == "train" for k, v in a.items() if v == "train")
    import pytest as _pt
    with _pt.raises(ValueError):
        hash_split(df, {"train": 0.5, "val": 0.4})


def test_corpus_report(spark):
    from mwas_rfam_spark.operators.summary import corpus_report

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta"), (4, "")],
        ["doc_id", "text"],
    )
    r = corpus_report(docs).collect()[0]
    assert r["n_docs"] == 4 and r["n_empty"] == 1
    assert r["n_tokens"] == 7 and r["avg_tokens"] == 1.75
    # docs 1 and 2 are exact duplicates: 3 distinct of 4 -> 0.25
    assert r["dup_rate_est"] == pytest.approx(0.25, abs=0.01)
    assert r["vocab_est"] == 4  # alpha beta gamma delta


def test_corpus_report_whitespace_boundaries(spark):
    """Trailing newlines/tabs must not inflate token counts, and a
    whitespace-only doc counts as empty."""
    from mwas_rfam_spark.operators.summary import corpus_report

    docs = spark.createDataFrame(
        [(1, "hello world\n"), (2, "\t"), (3, "  a  b  ")], ["doc_id", "text"]
    )
    r = corpus_report(docs).collect()[0]
    assert r["n_tokens"] == 4  # hello world a b
    assert r["n_empty"] == 1  # the tab-only doc


def test_randomness_domains_are_separated(spark):
    """hash_split / shuffle_shard / DSIR-Gumbel at the SAME seed must
    draw from different md5 domains: the test split must not be exactly
    the top shard-key decile or systematically own the top Gumbel keys
    (that coupling was real before the domain tags — selection over-
    sampled the held-out split)."""
    from mwas_rfam_spark.functions.scalar import md5_uniform
    from mwas_rfam_spark.plans.sampling import hash_split

    df = spark.range(4000).withColumnRenamed("id", "doc_id")
    split = hash_split(df, {"train": 0.9, "test": 0.1}, seed=0)
    # the untagged (shuffle_shard-domain) uniform for the same ids
    shard_u = md5_uniform(
        F.concat_ws(":", F.lit("0"), F.col("doc_id").cast("string"))
    )
    joined = split.withColumn("u_shard", shard_u)
    # if domains were shared, every test row would have u_shard >= 0.9
    test_low = joined.where((F.col("split") == "test") & (F.col("u_shard") < 0.9))
    assert test_low.count() > 0


def test_threshold_keep_all(spark):
    from mwas_rfam_spark.operators.selection import threshold_at_quantile

    scored = spark.createDataFrame([(1, 0.2), (2, 0.2), (3, 0.9)], ["doc_id", "score"])
    cut = threshold_at_quantile(scored, keep_frac=1.0)
    assert scored.where(F.col("score") > cut).count() == 3  # keep everything


def test_linear_scorer_strict_threshold(spark):
    """ADVICE r4: strict=True applies score > threshold — required for
    thresholds calibrated by threshold_at_quantile, which returns a
    member of the distribution (inclusive would keep ties and overshoot
    the keep fraction)."""
    docs = spark.createDataFrame([(1, "x"), (2, "y")], ["doc_id", "text"])
    weights = spark.createDataFrame([], "bucket INT, weight DOUBLE")
    # all scores are sigmoid(0)=0.5; strict > 0.5 keeps nothing
    out = score_quality_linear(docs, weights, bias=0.0, threshold=0.5, strict=True)
    assert {r["keep"] for r in out.collect()} == {False}


def test_quantile_threshold_composes_strict(spark):
    """threshold_at_quantile + strict gate lands at (not over) the
    requested keep fraction even with heavy score ties at the cut."""
    from mwas_rfam_spark.operators.selection import threshold_at_quantile

    rows = [(i, 0.3) for i in range(70)] + [(i, 0.8) for i in range(70, 100)]
    scored = spark.createDataFrame(rows, ["doc_id", "score"])
    cut = threshold_at_quantile(scored, keep_frac=0.3)
    kept_strict = scored.where(F.col("score") > cut).count()
    kept_incl = scored.where(F.col("score") >= cut).count()
    assert kept_strict == 30  # exactly the top 30%
    assert kept_incl == 30 or kept_incl == 100  # inclusive may keep every tie


def test_linear_scorer_duplicate_buckets_raise(spark):
    """ADVICE r4: a duplicated bucket row in the weights relation would
    fan out the broadcast join and inflate every touching doc's score —
    fail loudly instead. The check is in-plan (plan construction stays
    lazy), so the error surfaces at execution."""
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    weights = spark.createDataFrame(
        [(7, 1.0), (7, 2.0)], ["bucket", "weight"]
    )
    out = score_quality_linear(docs, weights)  # no job yet — lazy
    with pytest.raises(Exception, match="duplicate bucket"):
        out.collect()


# ------------------------------------------------------ temperature_mix


def test_mix_targets_sum_exactly_and_interpolate(spark, sf_dir):
    from mwas_rfam_spark.operators.selection import _mix_targets

    counts = {"a": 1000, "b": 100, "c": 10}
    for alpha in (0.0, 0.3, 0.5, 1.0, 2.0):
        t = _mix_targets(counts, alpha, 555)
        assert sum(t.values()) == 555
    # alpha=1 is natural proportions; alpha=0 equalizes
    nat = _mix_targets(counts, 1.0, 1110)
    assert nat == {"a": 1000, "b": 100, "c": 10}
    eq = _mix_targets(counts, 0.0, 333)
    assert eq == {"a": 111, "b": 111, "c": 111}
    # monotone: smaller alpha never shrinks the smallest source's share
    lo = _mix_targets(counts, 0.3, 1000)
    hi = _mix_targets(counts, 0.8, 1000)
    assert lo["c"] >= hi["c"]


def test_temperature_mix_counts_and_determinism(spark, sf_dir):
    from mwas_rfam_spark.operators.selection import _mix_targets, temperature_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    counts = {
        r["source"]: r["count"] for r in docs.groupBy("source").count().collect()
    }
    mixed = temperature_mix(docs, alpha=0.5, target_rows=300, seed=7)
    got = {r["source"]: r["count"] for r in mixed.groupBy("source").count().collect()}
    assert got == {
        s: t for s, t in _mix_targets(counts, 0.5, 300).items() if t > 0
    }
    again = temperature_mix(docs, alpha=0.5, target_rows=300, seed=7)
    key = lambda df: sorted((r["doc_id"], r["copy"]) for r in df.collect())
    assert key(mixed) == key(again)
    # a different seed changes the sampled remainder but not the counts
    other = temperature_mix(docs, alpha=0.5, target_rows=300, seed=8)
    assert {
        r["source"]: r["count"] for r in other.groupBy("source").count().collect()
    } == got
    assert key(other) != key(mixed)


def test_temperature_mix_identity_at_alpha_one(spark, sf_dir):
    from mwas_rfam_spark.operators.selection import temperature_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mixed = temperature_mix(docs, alpha=1.0)
    assert mixed.where(F.col("copy") != 0).count() == 0
    assert sorted(r["doc_id"] for r in mixed.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )


def test_temperature_mix_upsample_and_cap(spark):
    from mwas_rfam_spark.operators.selection import temperature_mix

    rows = [(i, "big") for i in range(90)] + [(100 + i, "small") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id int, source string")
    mixed = temperature_mix(docs, alpha=0.0, target_rows=100, seed=1)
    per = {r["source"]: r["count"] for r in mixed.groupBy("source").count().collect()}
    assert per == {"big": 50, "small": 50}
    # the small source runs 5 full passes (copy 0..4): every doc 5x
    small = mixed.where(F.col("source") == "small")
    assert small.groupBy("doc_id").count().where(F.col("count") != 5).count() == 0
    assert {r["copy"] for r in small.select("copy").distinct().collect()} == set(range(5))
    capped = temperature_mix(docs, alpha=0.0, target_rows=100, seed=1, allow_upsample=False)
    per_c = {r["source"]: r["count"] for r in capped.groupBy("source").count().collect()}
    assert per_c == {"big": 50, "small": 10}


def test_temperature_mix_remainder_matches_duckdb(spark, sf_dir):
    """The sampled remainder is the bottom-rem rows by the 'mix:'-tagged
    md5 uniform — replayable in SQL."""
    from mwas_rfam_spark.operators.selection import _mix_targets, temperature_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    counts = {
        r["source"]: r["count"] for r in docs.groupBy("source").count().collect()
    }
    targets = _mix_targets(counts, 0.5, 300)
    # precondition for the replay below: copy==0 is the sampled remainder
    # only for sources with no full pass (target < n) — true for every
    # source here; assert so a testdata regeneration can't silently turn
    # this into whole-pass-vs-remainder comparison
    assert all(targets[s] < counts[s] for s in targets)
    mixed = temperature_mix(docs, alpha=0.5, target_rows=300, seed=7)
    got = sorted((r["source"], r["doc_id"]) for r in mixed.where(F.col("copy") == 0).collect())
    con = duckdb.connect()
    tgt_rows = ", ".join(f"('{s}', {t}, {counts[s]})" for s, t in targets.items())
    want = con.sql(
        f"""
        WITH t(source, target, n) AS (VALUES {tgt_rows}),
        keyed AS (
          SELECT d.source, d.doc_id, t.target % t.n AS rem,
                 row_number() OVER (
                   PARTITION BY d.source
                   ORDER BY CAST('0x' || substr(md5('mix:7:' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT),
                            d.doc_id
                 ) AS rk
          FROM '{sf_dir}/documents.parquet' d JOIN t USING (source))
        SELECT source, doc_id FROM keyed WHERE rk <= rem
        ORDER BY source, doc_id
        """
    ).fetchall()
    assert got == [(s, i) for s, i in want]


def test_mix_report_accounting(spark, sf_dir):
    from mwas_rfam_spark.operators.selection import mix_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = mix_report(docs, alpha=0.5, target_rows=300).collect()
    assert sum(r["target_rows"] for r in rep) == 300
    assert sum(r["mixed_share"] for r in rep) == pytest.approx(1.0)
    for r in rep:
        assert r["epochs"] == pytest.approx(r["target_rows"] / r["n_docs"])


def test_temperature_mix_non_string_source(spark):
    """Numeric source columns must work: the plan relation is built with
    string keys then cast back to the input's type (regression — native
    ints used to fail createDataFrame's schema verification)."""
    from mwas_rfam_spark.operators.selection import mix_report, temperature_mix

    docs = spark.createDataFrame(
        [(i, i % 3) for i in range(60)], "doc_id int, source int"
    )
    mixed = temperature_mix(docs, alpha=0.0, target_rows=30, seed=2)
    per = {r["source"]: r["count"] for r in mixed.groupBy("source").count().collect()}
    assert per == {0: 10, 1: 10, 2: 10}
    assert dict(docs.dtypes)["source"] == dict(mixed.dtypes)["source"] == "int"
    rep = mix_report(docs, alpha=0.0, target_rows=30)
    assert sum(r["target_rows"] for r in rep.collect()) == 30


def test_mix_report_honors_upsample_cap(spark):
    """The report must describe the mix actually produced under
    allow_upsample=False (regression: it used to print uncapped
    targets that contradicted the written output)."""
    from mwas_rfam_spark.operators.selection import mix_report, temperature_mix

    rows = [(i, "big") for i in range(90)] + [(100 + i, "small") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id int, source string")
    rep = {
        r["source"]: r
        for r in mix_report(
            docs, alpha=0.0, target_rows=100, allow_upsample=False
        ).collect()
    }
    got = {
        r["source"]: r["count"]
        for r in temperature_mix(
            docs, alpha=0.0, target_rows=100, seed=1, allow_upsample=False
        ).groupBy("source").count().collect()
    }
    assert {s: rep[s]["target_rows"] for s in rep} == got == {"big": 50, "small": 10}
    assert rep["small"]["epochs"] == pytest.approx(1.0)


def test_negative_target_rows_raises(spark):
    """r12 review finding (execution-confirmed): a negative target fell
    through floor-division as (full=-1, rem>0) and EMITTED rows with
    copy=-1; both the mix and its report now refuse."""
    from mwas_rfam_spark.operators.selection import mix_report, temperature_mix

    docs = spark.createDataFrame(
        [(i, "a") for i in range(10)], ["doc_id", "source"]
    )
    with pytest.raises(ValueError, match="target_rows must be >= 0"):
        temperature_mix(docs, alpha=0.5, target_rows=-3)
    with pytest.raises(ValueError, match="target_rows must be >= 0"):
        mix_report(docs, alpha=0.5, target_rows=-3)


def test_quality_weights_bucket_out_of_range_raises(spark):
    """r12 review finding: a model trained at a different n_buckets has
    weight rows that can never match any occurrence — half the model
    silently vanished from the join; now an in-plan loud failure."""
    from mwas_rfam_spark.operators.selection import score_quality_linear

    docs = spark.createDataFrame([(1, "some text here")], ["doc_id", "text"])
    weights = spark.createDataFrame(
        [(9999, 1.0)], "bucket int, weight double"
    )
    with pytest.raises(Exception, match="different n_buckets"):
        score_quality_linear(docs, weights, n_buckets=4096).collect()


def test_seeded_draw_operators_refuse_null_ids(spark):
    """r12 review finding: NULL ids all draw the identical seeded
    uniform (concat_ws skips NULLs) with a NULL tie-break — selection
    becomes partition-order dependent; refuse loudly instead."""
    from mwas_rfam_spark.operators.selection import (
        importance_resample,
        temperature_mix,
    )

    docs = spark.createDataFrame(
        [(1, "a", "x"), (None, "a", "y")],
        "doc_id long, source string, text string",
    )
    with pytest.raises(Exception, match="non-null id"):
        temperature_mix(docs, alpha=0.5, target_rows=1, seed=7).collect()
    tgt = spark.createDataFrame([(5, "x")], "doc_id long, text string")
    with pytest.raises(Exception, match="non-null id"):
        importance_resample(docs, tgt, k=1).collect()


def test_importance_resample_preserves_id_column_name(spark):
    """r12 review finding: the internal doc_id rename leaked into the
    output when the caller's id column had another name."""
    from mwas_rfam_spark.operators.selection import importance_resample

    raw = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(8)], ["my_id", "text"]
    )
    tgt = spark.createDataFrame([(100, "text number 1")], ["my_id", "text"])
    out = importance_resample(raw, tgt, k=3, id_col="my_id")
    assert "my_id" in out.columns and "doc_id" not in out.columns
    assert out.count() == 3


def test_mix_refuses_zero_count_sources(spark):
    """r13 review finding: a caller-supplied counts map with a zero
    count crashed _mix_plan with a bare ZeroDivisionError (and at
    alpha=0, 0**0 == 1.0 even allocated target rows to the empty
    source first) — now a loud contract error."""
    from mwas_rfam_spark.operators.selection import temperature_mix

    docs = spark.createDataFrame(
        [(1, "t", "a"), (2, "t", "b")], "doc_id long, text string, source string"
    )
    with pytest.raises(ValueError, match="counts must be >= 1"):
        temperature_mix(
            docs, alpha=0.5, target_rows=2, counts={"a": 0, "b": 100}
        )
    with pytest.raises(ValueError, match="counts must be >= 1"):
        temperature_mix(
            docs, alpha=0.0, target_rows=2, counts={"a": -3, "b": 100}
        )


def test_quality_weights_null_bucket_refused(spark):
    """r13 review finding: a NULL-bucket weights row made the
    out-of-range guard evaluate to NULL (falls through the when), and
    the later equi-join silently dropped the weight — every score
    drifting toward sigmoid(bias) with no error."""
    from mwas_rfam_spark.operators.selection import score_quality_linear

    docs = spark.createDataFrame(
        [(1, "some words here")], "doc_id long, text string"
    )
    weights = spark.createDataFrame(
        [(0, 1.0), (None, 2.0)], "bucket int, weight double"
    )
    with pytest.raises(Exception, match="NULL bucket id"):
        score_quality_linear(docs, weights, n_buckets=4).collect()
