"""End-to-end corpus curation: the composed training-data pipeline.

One operator chaining the verified pieces in cost order — pure-column
quality gates first (cheapest, one projection pass), exact keep-first
dedup second (removes clone mass BEFORE anything shingles), benchmark
decontamination third (shingle explode only over survivors), PII
redaction and epoch shuffle-sharding last (only rows that will ship).

Every stage reuses an independently oracle-verified operator
(text_profile/repetition gates, dedup_first_seen's window-min rule,
text.contaminated_ids — the decision core of text.decontaminate, same
flag semantics, minus its zero-fill pass over the corpus —
text.redact_pii, plans/sampling.shuffle_shard), so the composition adds
no new semantics — only the order and the mark-vs-filter accounting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mwas_rfam_spark.operators.dedup import normalize_text
from mwas_rfam_spark.operators.text import (
    contaminated_ids,
    lang_id,
    redact_pii,
    token_count,
)
from mwas_rfam_spark.plans.sampling import shuffle_shard

#: drop-stage labels, in pipeline order (kept = survived everything)
STAGES = ("quality", "duplicate", "contaminated", "kept")


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    *,
    min_tokens: int = 5,
    max_tokens: int = 1_000_000,
    allowed_langs: tuple | None = None,
    max_dup_line_frac: float | None = None,
    decontam_n: int = 8,
    decontam_threshold: float = 0.05,
    redact: bool = True,
    n_shards: int | None = None,
    seed: int = 0,
    mode: str = "filter",
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize_unicode: bool = False,
    dedup_lines: bool = False,
    min_dedup_line_len: int = 0,
    quality_model_weights: DataFrame | None = None,
    quality_model_bias: float = 0.0,
    quality_model_threshold: float = 0.5,
    quality_model_buckets: int = 4096,
    quality_model_strict: bool = False,
) -> DataFrame:
    """Curate a document corpus for training.

    ``mode='filter'`` returns only surviving rows (plus ``shard``/``seq``
    when ``n_shards`` is set). ``mode='mark'`` returns EVERY input row
    with a ``drop_stage`` column in :data:`STAGES` — accounting is then
    one groupBy, and the marked frame filters to the same survivors
    (tested). Stages mark in pipeline order: a low-quality duplicate is
    'quality', never 'duplicate' — each stage only examines rows earlier
    stages kept, exactly like the filtering pipeline.

    Scale shape: the quality gate is one projection (no shuffle); dedup
    is one window over content-hash groups; decontamination shuffles only
    surviving (id, shingle) rows against broadcast eval shingles;
    redaction is chained codegen'd regexp_replace; sharding is a
    projection plus the optional per-shard sequence window.

    ``normalize_unicode=True`` prepends the unicode-hygiene kernel
    (mojibake repair, NFC, invisible-char strip —
    `text.normalize_unicode_docs`) BEFORE any hashing stage, so
    byte-different spellings of the same text dedup/decontaminate
    together; the text column rewrites in place.

    ``dedup_lines=True`` prepends C4-style cross-document line dedup
    (two more keyed shuffles — line text, then doc id); the downstream
    stages then see the line-deduped text, and a doc emptied of lines
    fails the token gate ('quality').

    ``quality_model_strict=True`` makes the model gate compare
    ``score > threshold`` — required when ``quality_model_threshold``
    was calibrated by ``selection.threshold_at_quantile`` (which returns
    a member of the score distribution; inclusive would keep ties and
    overshoot the calibrated keep fraction).
    """
    if mode not in ("filter", "mark"):
        raise ValueError(f"mode must be 'filter' or 'mark', got {mode}")
    # NULL ids refuse in-plan (r13 review finding; same rule as the
    # selection family's seeded draws and the packers): every stage
    # downstream keys on the id — the decontamination and quality-model
    # flags join back on it (a NULL row silently NEVER matches, so a
    # contaminated doc shipped as 'kept'), the line-dedup rebuild joins
    # on it (a NULL row's text silently blanked to ''), and the q- skew
    # sentinel concat()s it (NULL concat = NULL = the single straggler
    # partition the sentinel exists to avoid).
    _id_type = docs.schema[id_col].dataType.simpleString()
    docs = docs.withColumn(
        id_col,
        F.when(
            F.col(id_col).isNull(),
            F.raise_error(
                F.lit(
                    f"curate_corpus: NULL {id_col} — every curation stage "
                    "keys on a non-null id; fill ids first"
                )
            ).cast(_id_type),
        ).otherwise(F.col(id_col)),
    )
    if mode == "mark" and n_shards is not None:
        # sharding assigns training order to SURVIVORS; a shard over
        # dropped rows is meaningless and was silently ignored (r12
        # review finding) — refuse instead
        raise ValueError("n_shards applies to mode='filter' only")
    if benchmark is not None:
        missing = [c for c in (id_col, text_col) if c not in benchmark.columns]
        if missing:
            # decontaminate shingles the benchmark under the SAME
            # column names; without the check the failure was an
            # UNRESOLVED_COLUMN deep inside word_shingles (r12 review)
            raise ValueError(
                f"benchmark frame lacks column(s) {missing} — it must "
                f"carry {id_col!r} and {text_col!r} like the corpus"
            )

    if normalize_unicode:
        # unicode hygiene FIRST — every later stage hashes text (line
        # dedup keys, content-hash dedup, decontam shingles), and
        # byte-different spellings of the same text (mojibake, NFD,
        # zero-width) would defeat them all; text rewrites in place,
        # the flag columns stay internal. BOTH sides of decontamination
        # normalize — a one-sided repair would unmatch shingles against
        # a raw benchmark (including previously-exact mojibake matches).
        # Caller-owned columns that happen to share the kernel's flag
        # names are shielded (same collision discipline as _qm_keep).
        from mwas_rfam_spark.operators.text import normalize_unicode_docs

        def _normalize_keep_cols(df: DataFrame) -> DataFrame:
            shield = [c for c in ("was_mojibake", "was_changed") if c in df.columns]
            for c in shield:
                df = df.withColumnRenamed(c, f"__orig_{c}")
            df = normalize_unicode_docs(df, text_col=text_col).drop(
                "was_mojibake", "was_changed"
            )
            for c in shield:
                df = df.withColumnRenamed(f"__orig_{c}", c)
            return df

        docs = _normalize_keep_cols(docs)
        if benchmark is not None:
            benchmark = _normalize_keep_cols(benchmark)

    if dedup_lines:
        # C4 stage order: cross-document line dedup BEFORE the quality
        # gates (Raffel et al. 2020 run the three-sentence rule first),
        # so boilerplate-stripped docs face the token gate with their
        # real content. Rewrites text in place; a doc reduced to nothing
        # loses every line, fails the token gate, and marks 'quality' —
        # mark-mode rows therefore carry the DEDUPED text (documented).
        from mwas_rfam_spark.operators.dedup import line_dedup

        deduped = line_dedup(
            docs.select(id_col, text_col),
            text_col=text_col,
            id_col=id_col,
            min_dedup_len=min_dedup_line_len,
        ).withColumnRenamed(text_col, "_ld_text")
        docs = (
            docs.join(deduped, id_col, "left")
            .withColumn(text_col, F.coalesce("_ld_text", F.lit("")))
            .drop("_ld_text")
        )

    base = docs.withColumn("_toks_n", token_count(F.col(text_col)))
    quality_ok = (F.col("_toks_n") >= min_tokens) & (F.col("_toks_n") <= max_tokens)
    if allowed_langs is not None:
        quality_ok = quality_ok & lang_id(F.col(text_col)).isin(list(allowed_langs))
    if max_dup_line_frac is not None:
        # Gopher repetition gate — a doc-keyed profile join, added ONLY
        # when requested (it costs the repetition explode+rollup, unlike
        # the pure-projection gates above). The explode runs over rows the
        # cheap gates already kept, never the whole corpus: a row the
        # projection gates drop is 'quality' regardless of its repetition
        # stats, so profiling it is pure waste (at 100 TB the explode is
        # the expensive half of this stage). Absent profile rows coalesce
        # to 0.0, which only cheap-gate failures hit — their quality_ok is
        # already false, so semantics are unchanged (parity-tested).
        from mwas_rfam_spark.operators.text import repetition_profile

        rp = repetition_profile(
            base.where(quality_ok).select(id_col, text_col),
            text_col=text_col,
            id_col=id_col,
        ).select(id_col, F.col("dup_line_frac").alias("_rp_dlf"))
        # private name (_rp_dlf): a caller-owned dup_line_frac column
        # made the join ambiguous (crash) or was silently dropped later
        # (r12 review finding; same shield discipline as _qm_keep)
        base = base.join(rp, id_col, "left")
        quality_ok = quality_ok & (
            F.coalesce("_rp_dlf", F.lit(0.0)) <= max_dup_line_frac
        )
    if quality_model_weights is not None:
        # classifier gate (fastText-shaped linear scorer) — same
        # cost discipline as the repetition gate above: the feature
        # explode runs ONLY over rows the cheap projection gates kept;
        # unscored rows (cheap-gate failures) coalesce to keep=True so
        # their drop reason stays the cheap gate's. Failures mark
        # 'quality' like every other quality sub-gate.
        from mwas_rfam_spark.operators.selection import score_quality_linear

        scored = score_quality_linear(
            base.where(quality_ok).select(id_col, text_col),
            quality_model_weights,
            bias=quality_model_bias,
            n_buckets=quality_model_buckets,
            threshold=quality_model_threshold,
            text_col=text_col,
            id_col=id_col,
            strict=quality_model_strict,
        ).withColumnRenamed("doc_id", id_col).select(
            id_col, F.col("keep").alias("_qm_keep")  # private name: the
            # input corpus may carry its own 'keep' column
        )
        base = base.join(scored, id_col, "left")
        quality_ok = quality_ok & F.coalesce("_qm_keep", F.lit(True))

    base = base.withColumn("_q_ok", quality_ok).drop(
        "_toks_n", "_rp_dlf", "_qm_keep"
    )
    if mode == "filter":
        # filter mode never reports drop stages, so rows the quality
        # gates dropped need not ride through the dedup window's
        # full-corpus shuffle and the decontamination join just to be
        # discarded at the end — at scale this was roughly double the
        # shuffle mass of the two heaviest stages (r12 review finding;
        # mark mode keeps every row, as its contract requires)
        base = base.where(F.col("_q_ok"))

    # keep-first per content hash AMONG quality survivors (same window-min
    # rule the dedup_first_seen entry hash-verifies); losers mark 'duplicate'
    # quality failures get a per-row hash so they never pile into one
    # null-hash window partition (a skew single-task at scale)
    w = Window.partitionBy("_hash").orderBy(F.col(id_col))
    base = base.withColumn(
        "_hash",
        # coalesce: NULL text is "no content" == the empty document
        # (the text family's pinned convention) — a NULL md5 would
        # funnel every NULL-text row into one null-hash window
        # partition, the exact skew the q- sentinel exists to avoid
        # (r12 review finding); empty/NULL docs that pass a
        # min_tokens=0 gate dedup together to one survivor
        F.when(
            F.col("_q_ok"),
            F.md5(F.coalesce(normalize_text(F.col(text_col)), F.lit(""))),
        )
        .otherwise(F.concat(F.lit("q-"), F.col(id_col).cast("string"))),
    ).withColumn(
        "_dup",
        F.col("_q_ok") & (F.row_number().over(w) > 1),
    ).drop("_hash")

    survivors = base.where(F.col("_q_ok") & ~F.col("_dup"))
    if benchmark is not None:
        # decision-only decontamination (contaminated_ids): the full
        # decontaminate report zero-fills shingle-less docs via a
        # train.select(id).distinct() pass, which in this composed plan
        # was a THIRD full execution of the corpus subtree (scan +
        # quality gates + dedup window; the three subtrees prune
        # different columns, so exchange reuse can't fire — plan audit,
        # r14 opt round). Only the flag is consumed here, and the left
        # join's coalesce(False) reproduces the zero-fill exactly: a
        # doc absent from the flag relation (no shingles, or below
        # threshold) is not contaminated — the same rows decontaminate
        # marks False (parity-pinned by tests/test_curation_parity.py).
        flags = contaminated_ids(
            survivors, benchmark, n=decontam_n, threshold=decontam_threshold,
            text_col=text_col, id_col=id_col,
        ).withColumn("_decon_flag", F.lit(True))
        # private name: a caller-owned 'contaminated' column (the
        # decontaminate output being re-curated) made this join
        # ambiguous (r12 review finding)
        base = base.join(flags, id_col, "left").withColumn(
            "_contam", F.coalesce("_decon_flag", F.lit(False))
        ).drop("_decon_flag")
    else:
        base = base.withColumn("_contam", F.lit(False))

    if mode == "mark":
        out = base.withColumn(
            "drop_stage",
            F.when(~F.col("_q_ok"), F.lit("quality"))
            .when(F.col("_dup"), F.lit("duplicate"))
            .when(F.col("_contam"), F.lit("contaminated"))
            .otherwise(F.lit("kept")),
        ).drop("_q_ok", "_dup", "_contam")
        if redact:
            # the marked frame's 'kept' rows must carry the SAME text
            # filter mode would ship — redact was silently ignored in
            # mark mode, leaving PII in rows downstream filters to
            # 'kept' (r12 review finding); dropped rows keep their
            # original text for forensics
            out = out.withColumn(
                text_col,
                F.when(
                    F.col("drop_stage") == "kept",
                    redact_pii(F.col(text_col)),
                ).otherwise(F.col(text_col)),
            )
        return out

    kept = base.where(F.col("_q_ok") & ~F.col("_dup") & ~F.col("_contam")).drop(
        "_q_ok", "_dup", "_contam"
    )
    if redact:
        kept = kept.withColumn(text_col, redact_pii(F.col(text_col)))
    if n_shards is not None:
        kept = shuffle_shard(kept, n_shards=n_shards, seed=seed, id_col=id_col)
    return kept
