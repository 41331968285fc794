"""Cross-engine parity for the composed curation pipeline: the full
quality → keep-first dedup → decontamination → shard relational chain,
replayed in DuckDB SQL over the same parquet, must label and shard every
document identically. (Redaction is excluded here — DuckDB's RE2 has no
lookarounds for the phone/SSN patterns — and is unit-tested on its own.)
"""

import duckdb
from pyspark.sql import functions as F


MIN_TOKENS, DECONTAM_N, THRESH, N_SHARDS, SEED = 5, 5, 0.2, 8, 42

# stage labels per training doc, then shard/seq over the kept set — the
# exact relational semantics of curate_corpus(mode='mark') + shuffle_shard
CURATE_SQL = f"""
WITH train AS (SELECT doc_id, text FROM docs WHERE doc_id % 97 <> 0),
bench_docs AS (SELECT doc_id, text FROM docs WHERE doc_id % 97 = 0),
tokd AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_toks
  FROM train),
gated AS (SELECT *, n_toks >= {MIN_TOKENS} AS q_ok FROM tokd),
hashed AS (
  SELECT *, CASE WHEN q_ok
                 THEN md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                 ELSE 'q-' || CAST(doc_id AS VARCHAR) END AS h
  FROM gated),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rk FROM hashed),
surv AS (SELECT doc_id, text FROM ranked WHERE q_ok AND rk = 1),
sh AS (SELECT DISTINCT doc_id, s FROM (
         SELECT doc_id,
                unnest(list_transform(range(1, greatest(len(toks) - {DECONTAM_N - 2}, 1)),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                            || ' ' || toks[i+3] || ' ' || toks[i+4])) AS s
         FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
               FROM surv))
       WHERE s <> ''),
bsh AS (SELECT DISTINCT s FROM (
          SELECT unnest(list_transform(range(1, greatest(len(toks) - {DECONTAM_N - 2}, 1)),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                             || ' ' || toks[i+3] || ' ' || toks[i+4])) AS s
          FROM (SELECT string_split_regex(trim(text), '\\s+') AS toks
                FROM bench_docs))
        WHERE s <> ''),
contam AS (
  SELECT sh.doc_id,
         count(*) AS n_sh,
         sum(CASE WHEN bsh.s IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
  FROM sh LEFT JOIN bsh ON sh.s = bsh.s GROUP BY 1),
flags AS (
  SELECT s.doc_id,
         coalesce(c.n_hit / CAST(c.n_sh AS DOUBLE), 0.0) >= {THRESH}
             AND coalesce(c.n_sh, 0) > 0 AS contaminated
  FROM surv s LEFT JOIN contam c USING (doc_id)),
staged AS (
  SELECT r.doc_id,
         CASE WHEN NOT r.q_ok THEN 'quality'
              WHEN r.rk > 1 THEN 'duplicate'
              WHEN coalesce(f.contaminated, FALSE) THEN 'contaminated'
              ELSE 'kept' END AS drop_stage
  FROM ranked r LEFT JOIN flags f USING (doc_id))
SELECT s.doc_id, s.drop_stage, k.shard, k.seq
FROM staged s
LEFT JOIN (
  SELECT doc_id,
         CAST(CAST('0x' || substr(key, 1, 8) AS BIGINT) % {N_SHARDS}
              AS INT) AS shard,
         CAST(row_number() OVER (
             PARTITION BY CAST('0x' || substr(key, 1, 8) AS BIGINT) % {N_SHARDS}
             ORDER BY key, doc_id) AS BIGINT) AS seq
  FROM (SELECT doc_id, md5('{SEED}:' || CAST(doc_id AS VARCHAR)) AS key
        FROM staged WHERE drop_stage = 'kept')
) k USING (doc_id)
"""


def test_curation_pipeline_cross_engine(spark, sf_dir):
    from mwas_rfam_spark.operators.curation import curate_corpus
    from mwas_rfam_spark.plans.sampling import shuffle_shard

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    train = docs.where(F.col("doc_id") % 97 != 0)
    bench = docs.where(F.col("doc_id") % 97 == 0)

    marked = curate_corpus(
        train, bench, min_tokens=MIN_TOKENS, decontam_n=DECONTAM_N,
        decontam_threshold=THRESH, mode="mark",
    ).select("doc_id", "drop_stage")
    kept = curate_corpus(
        train, bench, min_tokens=MIN_TOKENS, decontam_n=DECONTAM_N,
        decontam_threshold=THRESH, redact=False, n_shards=N_SHARDS, seed=SEED,
    ).select("doc_id", "shard", "seq")
    got = {
        r["doc_id"]: (r["drop_stage"], r["shard"], r["seq"])
        for r in marked.join(kept, "doc_id", "left").collect()
    }

    con = duckdb.connect()
    con.sql(f"CREATE VIEW docs AS SELECT doc_id, text FROM '{sf_dir}/documents.parquet'")
    want = {r[0]: (r[1], r[2], r[3]) for r in con.sql(CURATE_SQL).fetchall()}

    assert got == want
    stages = {v[0] for v in want.values()}
    assert "kept" in stages  # the comparison isn't vacuous


def test_quality_model_gate_composes(spark):
    """The classifier gate drops exactly the below-threshold docs, only
    among cheap-gate survivors, and mark-mode labels them 'quality'."""
    from mwas_rfam_spark.operators.curation import curate_corpus
    from mwas_rfam_spark.operators.selection import (
        hashed_ngram_features,
        score_quality_linear,
        threshold_at_quantile,
    )

    docs = spark.createDataFrame(
        [(1, "good text with enough tokens here")] 
        + [(2, "bad junk with enough tokens here")]
        + [(3, "tiny")]  # fails min_tokens before the model ever sees it
        + [(4, "good text with enough tokens here")],  # dup of 1
        ["doc_id", "text"],
    )
    feats = hashed_ngram_features(
        spark.createDataFrame([(0, "good"), (1, "junk")], ["doc_id", "text"]),
        bigrams=False,
    )
    b = {r["doc_id"]: r["bucket"] for r in feats.collect()}
    weights = spark.createDataFrame([(b[0], 5.0), (b[1], -5.0)], ["bucket", "weight"])

    marked = curate_corpus(
        docs, None, min_tokens=3, mode="mark",
        quality_model_weights=weights, quality_model_threshold=0.5,
    )
    stages = {r["doc_id"]: r["drop_stage"] for r in marked.collect()}
    assert stages[1] == "kept"
    assert stages[2] == "quality"  # model gate
    assert stages[3] == "quality"  # cheap gate, never scored
    assert stages[4] == "duplicate"

    kept = curate_corpus(
        docs, None, min_tokens=3,
        quality_model_weights=weights, quality_model_threshold=0.5,
    )
    assert [r["doc_id"] for r in kept.collect()] == [1]

    # quantile calibration: cutoff keeping the top half separates the
    # two scored docs
    scored = score_quality_linear(
        docs.where("doc_id in (1, 2)"), weights, bias=0.0
    )
    cut = threshold_at_quantile(scored, keep_frac=0.5)
    # strict >: the sketch returns a nearest-rank member, so >= would
    # keep the cutoff row too (documented contract)
    kept_ids = {r["doc_id"] for r in scored.where(F.col("score") > cut).collect()}
    assert kept_ids == {1}


def test_curate_shields_caller_owned_columns(spark):
    """r12 review findings: caller-owned dup_line_frac / contaminated
    columns used to make the gate joins ambiguous (crash) or be
    silently dropped."""
    from mwas_rfam_spark.operators.curation import curate_corpus

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today", 0.9, True),
            (2, "an entirely different document with plenty of words", 0.1, False),
        ],
        "doc_id long, text string, dup_line_frac double, contaminated boolean",
    )
    bench = spark.createDataFrame(
        [(100, "completely unrelated benchmark text body")], "doc_id long, text string"
    )
    out = curate_corpus(
        docs, benchmark=bench, min_tokens=2, max_dup_line_frac=0.5, mode="mark"
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    # caller columns survive untouched
    assert rows[1]["dup_line_frac"] == 0.9 and rows[1]["contaminated"] is True
    assert rows[1]["drop_stage"] == "kept"


def test_curate_mark_mode_redacts_kept_rows(spark):
    """r12 review finding: mode='mark' silently ignored redact — rows
    marked 'kept' carried unredacted PII."""
    from mwas_rfam_spark.operators.curation import curate_corpus

    docs = spark.createDataFrame(
        [(1, "contact me at someone@example.com for all the details")],
        "doc_id long, text string",
    )
    out = curate_corpus(docs, min_tokens=2, mode="mark", redact=True).collect()[0]
    assert out["drop_stage"] == "kept"
    assert "@" not in out["text"]


def test_curate_mark_rejects_n_shards_and_bad_benchmark(spark):
    import pytest

    from mwas_rfam_spark.operators.curation import curate_corpus

    docs = spark.createDataFrame(
        [(1, "some words here")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="n_shards"):
        curate_corpus(docs, mode="mark", n_shards=4)
    bad_bench = spark.createDataFrame([("text only",)], "text string")
    with pytest.raises(ValueError, match="benchmark frame lacks"):
        curate_corpus(docs, benchmark=bad_bench)


def test_curate_corpus_refuses_null_doc_id(spark):
    """r13 review finding: a NULL-id doc silently bypassed the
    decontamination and quality-model gates (its flag rows never match
    back through the id equi-join), and with dedup_lines=True its text
    was silently blanked — every curation stage keys on the id, so a
    NULL id now refuses in-plan."""
    import pytest

    from mwas_rfam_spark.operators.curation import curate_corpus

    docs = spark.createDataFrame(
        [(1, "good document with several words here"),
         (None, "ghost document with enough words to pass gates")],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="NULL doc_id"):
        curate_corpus(docs, mode="mark").collect()
