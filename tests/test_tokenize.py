"""BPE tokenizer: hand-verified merges, encode/decode inverse,
determinism across partitionings, the bounded-sample guard, and the
budget-count integration."""

import pytest
from pyspark.sql import functions as F

from mwas_rfam_spark.functions.bpe import (
    EOW,
    decode_tokens,
    encode_text,
    encode_word,
    ranks_from_merges,
    train_bpe,
    word_frequencies,
)
from mwas_rfam_spark.operators.tokenize import (
    bpe_encode,
    bpe_token_budget_counts,
    train_bpe_merges,
)


def test_train_bpe_hand_model():
    """Sennrich's canonical example family: {low×5, lower×2, newest×6,
    widest×3}. First merges must assemble 'est</w>' (9 occurrences
    dominate)."""
    freq = word_frequencies(["low " * 5 + "lower " * 2 + "newest " * 6 + "widest " * 3])
    merges = train_bpe(freq, 4)
    assert merges[0] == ("e", "s")          # 9 (newest+widest)
    assert merges[1] == ("es", "t")         # 9
    assert merges[2] == ("est", EOW)        # 9
    assert merges[3] == ("l", "o")          # 7 (low+lower)
    ranks = ranks_from_merges(merges)
    assert encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert encode_word("low", ranks) == ["lo", "w", EOW]


def test_train_bpe_tie_break_deterministic():
    # "ab" and "cd" both appear twice; lexicographically smallest wins
    merges = train_bpe(word_frequencies(["ab ab cd cd"]), 1)
    assert merges[0] == ("a", "b")
    assert train_bpe(word_frequencies(["cd cd ab ab"]), 1) == merges


def test_encode_decode_inverse():
    corpus = "the quick brown fox jumps over the lazy dog the end"
    merges = train_bpe(word_frequencies([corpus]), 30)
    ranks = ranks_from_merges(merges)
    toks = encode_text(corpus, ranks)
    assert decode_tokens(toks) == corpus
    # unseen words still encode (down to characters) and round-trip
    toks2 = encode_text("zebra xylophone", ranks)
    assert decode_tokens(toks2) == "zebra xylophone"
    assert encode_text("", ranks) == [] and encode_text(None, ranks) == []


def test_train_merges_spark_and_encode(spark):
    docs = spark.createDataFrame(
        [(i, "the training corpus has repeated phrases " * 3) for i in range(20)]
        + [(100 + i, f"rare document {i} with unique text") for i in range(5)],
        ["doc_id", "text"],
    )
    merges = train_bpe_merges(docs, num_merges=50, sample_docs=25)
    assert merges.columns == ["rank", "left", "right"]
    n = merges.count()
    assert 0 < n <= 50

    enc = bpe_encode(docs, merges).collect()
    by_id = {r["doc_id"]: r for r in enc}
    assert len(by_id) == 25
    # identical texts -> identical token streams and counts
    assert by_id[0]["tokens"] == by_id[19]["tokens"]
    assert by_id[0]["n_tokens"] == len(by_id[0]["tokens"]) > 0
    # decode round-trips the normalized text
    assert decode_tokens(list(by_id[100]["tokens"])) == "rare document 0 with unique text"

    # counts-only path matches the full path, without the arrays
    counts = bpe_encode(docs, merges, emit_tokens=False)
    assert counts.columns == ["doc_id", "n_tokens"]
    got = {r["doc_id"]: r["n_tokens"] for r in counts.collect()}
    assert got == {i: r["n_tokens"] for i, r in by_id.items()}

    # training is deterministic and partitioning-independent
    again = train_bpe_merges(docs.repartition(13), num_merges=50, sample_docs=25)
    assert [tuple(r) for r in merges.collect()] == [tuple(r) for r in again.collect()]


def test_bpe_sample_byte_guard(spark):
    docs = spark.createDataFrame([(1, "x" * 1000)], ["doc_id", "text"])
    with pytest.raises(ValueError, match="max_sample_bytes"):
        train_bpe_merges(docs, num_merges=5, sample_docs=1, max_sample_bytes=100)
    with pytest.raises(ValueError, match="num_merges"):
        train_bpe_merges(docs, num_merges=0)


def test_bpe_token_budget_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "web"),
            (2, "alpha beta", "web"),
            (3, "delta epsilon zeta eta", "books"),
        ],
        ["doc_id", "text", "source"],
    )
    merges = train_bpe_merges(docs, num_merges=10, sample_docs=3)
    enc = {r["doc_id"]: r["n_tokens"] for r in bpe_encode(docs, merges).collect()}
    got = {
        r["group"]: (r["n_docs"], r["n_tokens"])
        for r in bpe_token_budget_counts(docs, merges, "source").collect()
    }
    assert got == {
        "web": (2, enc[1] + enc[2]),
        "books": (1, enc[3]),
    }


def test_bpe_encode_real_documents(spark, sf_dir):
    """Real corpus smoke at test SF: every doc encodes, counts are
    positive for non-empty docs, and compression beats characters
    (tokens <= whitespace tokens * some factor is not guaranteed, but
    tokens < characters always holds with any merge applied)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    merges = train_bpe_merges(docs, num_merges=200, sample_docs=200)
    enc = bpe_encode(docs, merges, emit_tokens=False)
    joined = enc.join(docs, "doc_id").select(
        "n_tokens", F.length(F.lower(F.trim("text"))).alias("chars")
    )
    bad = joined.where((F.col("chars") > 0) & (F.col("n_tokens") > F.col("chars") + 1)).count()
    assert bad == 0
    assert joined.where(F.col("n_tokens") > 0).count() == docs.where(
        F.length(F.trim("text")) > 0
    ).count()


def test_bpe_encode_passthrough_no_rejoin(spark):
    """passthrough_cols ride through the Arrow stage — the budget-count
    plan must contain exactly one scan of the corpus and no join."""
    docs = spark.createDataFrame(
        [(1, "a b", "web"), (2, "a", "books")], ["doc_id", "text", "source"]
    )
    from mwas_rfam_spark.operators.tokenize import bpe_token_budget_counts

    out = bpe_token_budget_counts(docs, [("a", "</w>")], "source")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    got = {r["group"]: r["n_tokens"] for r in out.collect()}
    assert got["web"] > 0 and got["books"] > 0


def test_pack_by_real_bpe_counts(spark):
    """pack_documents(token_count_col=...) composes with bpe_encode: the
    pack assignment follows the BPE counts, not the whitespace proxy."""
    from mwas_rfam_spark.operators.packing import pack_documents

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * (1 + i % 3)) for i in range(40)],
        ["doc_id", "text"],
    )
    merges = train_bpe_merges(docs, num_merges=30, sample_docs=40)
    counted = bpe_encode(docs, merges, emit_tokens=False)
    packed = pack_documents(
        counted.withColumn("text", F.lit(None).cast("string")),
        max_tokens_per_pack=64,
        n_buckets=4,
        token_count_col="n_tokens",
    )
    rows = packed.collect()
    want = {r["doc_id"]: r["n_tokens"] for r in counted.collect()}
    assert {r["doc_id"]: r["n_tokens"] for r in rows} == want
    # concat-then-chunk invariant per bucket: total packs = ceil(sum/64)
    import math

    from collections import defaultdict

    per_bucket = defaultdict(list)
    for r in rows:
        per_bucket[r["bucket"]].append(r)
    for b, rs in per_bucket.items():
        total = sum(r["n_tokens"] for r in rs)
        n_packs = len({r["pack_id"] for r in rs})
        assert n_packs <= max(1, math.ceil(total / 64))


def test_bpe_vocab_and_id_encode_roundtrip(spark):
    """Vocabulary relation + id encode: ids are stable, decode through
    the vocab inverts the text, corpus-alphabet coverage means no <unk>
    on in-corpus text, and out-of-alphabet symbols map to 0."""
    from mwas_rfam_spark.functions.bpe import decode_tokens
    from mwas_rfam_spark.operators.tokenize import bpe_encode_ids, bpe_vocab

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)],
        ["doc_id", "text"],
    )
    merges = train_bpe_merges(docs, num_merges=30, sample_docs=10)
    vocab = bpe_vocab(merges, docs)
    vrows = {r["id"]: r["token"] for r in vocab.collect()}
    assert vrows[0] == "<unk>"
    assert len(vrows) == len(set(vrows.values()))  # injective

    enc = bpe_encode_ids(docs, merges, vocab)
    row = enc.where("doc_id = 3").first()
    assert row["n_tokens"] == len(row["token_ids"])
    assert 0 not in row["token_ids"]  # full alphabet coverage
    assert (
        decode_tokens([vrows[i] for i in row["token_ids"]])
        == "the quick brown fox jumps over the lazy dog"
    )

    # unseen characters become <unk> but the stream stays aligned
    weird = spark.createDataFrame([(1, "fox ΩΩΩ")], ["doc_id", "text"])
    wrow = bpe_encode_ids(weird, merges, vocab).first()
    assert 0 in wrow["token_ids"] and wrow["n_tokens"] == len(wrow["token_ids"])

    # determinism: same merges + docs -> identical vocab ids
    again = bpe_vocab(merges, docs)
    assert sorted(map(tuple, vocab.collect())) == sorted(map(tuple, again.collect()))


def test_corpus_trained_bpe_matches_driver_side_exactly(spark):
    """train_bpe_merges_corpus: distributed word-frequency aggregation
    under word_frequencies' exact normalization (lower + Unicode-
    whitespace split, incl. tabs/newlines/NBSP and None texts), so with
    an uncapped vocabulary the corpus-trained merge table equals
    train_bpe(word_frequencies(all texts)) verbatim; the type cap is
    deterministic (freq desc, word asc) and the collect byte budget
    fails loud."""
    from collections import Counter

    from mwas_rfam_spark.functions.bpe import train_bpe, word_frequencies
    from mwas_rfam_spark.operators.tokenize import (
        bpe_encode,
        corpus_word_frequencies,
        train_bpe_merges_corpus,
    )

    texts = [
        "the Quick\tbrown FOX", "the the THE lazy dog\n dog",
        "pack my box with five dozen jugs", None,
        "  leading and trailing  ", "MiXeD CaSe mixed case",
        # r13 review finding: Python str.split() also splits the C0
        # separators U+001C-001F (bidi classes B/S), which Java's (?U)\s
        # alone does NOT - these rows pin the explicit [\x1c-\x1f]
        # extension in corpus_word_frequencies' split pattern (NEL \x85
        # and NBSP were already covered)
        "fs\x1cseparated\x1dgroup\x1erecord\x1funit",
        "nel\x85split ok",
    ] * 3 + ["zebra quartz"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).cache()

    want_freq = word_frequencies([t for t in texts if t])
    got_freq = {
        r["word"]: r["freq"] for r in corpus_word_frequencies(docs).collect()
    }
    assert got_freq == dict(want_freq)

    want = train_bpe(want_freq, 40)
    got = train_bpe_merges_corpus(docs, num_merges=40)
    assert [(r["left"], r["right"]) for r in
            sorted(got.collect(), key=lambda r: r["rank"])] == want

    # deterministic cap: top-3 types by (freq desc, word asc)
    top3 = Counter(dict(sorted(
        want_freq.items(), key=lambda kv: (-kv[1], kv[0]))[:3]))
    want_capped = train_bpe(top3, 10)
    got_capped = train_bpe_merges_corpus(docs, num_merges=10, max_word_types=3)
    assert [(r["left"], r["right"]) for r in
            sorted(got_capped.collect(), key=lambda r: r["rank"])] == want_capped

    # the corpus-trained table drives the same encoder
    enc = bpe_encode(docs.where("text IS NOT NULL"), got)
    assert enc.where("n_tokens <= 0").count() == 0

    with pytest.raises(ValueError, match="max_collect_bytes"):
        train_bpe_merges_corpus(docs, num_merges=5, max_collect_bytes=10)
    with pytest.raises(ValueError, match="max_word_types"):
        corpus_word_frequencies(docs, max_word_types=0)


def test_encode_word_heap_matches_reference_scan():
    """r12: the O(L log L) heap encode must be decision-for-decision
    identical to the former O(L^2) rescan greedy (lowest rank, leftmost
    tie) — differential test over randomized merge tables."""
    import random

    from mwas_rfam_spark.functions.bpe import EOW, encode_word

    def reference(word, ranks):
        syms = list(word) + [EOW]
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    rng = random.Random(7)
    alpha = "abcd"
    for trial in range(200):
        word = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 24)))
        # random rank table over plausible merge products
        pieces = list(alpha) + [EOW, "ab", "cd", "abc", "aa", "aab", "abcd"]
        items = [(a, b) for a in pieces for b in pieces]
        rng.shuffle(items)
        ranks = {p: i for i, p in enumerate(items[: rng.randint(0, 40)])}
        assert encode_word(word, ranks) == reference(word, ranks), (word, ranks)


def test_encode_word_long_unbroken_word_fast():
    """r12 review finding: one unbroken 200k-char word used to take
    O(L^2) — effectively hanging the encode kernel."""
    import time

    from mwas_rfam_spark.functions.bpe import encode_word, ranks_from_merges, train_bpe

    from collections import Counter

    merges = train_bpe(Counter({"abab": 5, "abc": 3}), 6)
    ranks = ranks_from_merges(merges)
    word = "ab" * 100_000
    t0 = time.time()
    out = encode_word(word, ranks)
    assert time.time() - t0 < 10
    assert "".join(out).replace("</w>", "") == word


def test_bounded_word_cache_caps_within_batch():
    """r13 ADVICE item: the 1M memo cap was only checked BETWEEN Arrow
    batches; a single high-cardinality batch could grow it unbounded.
    The cap now lives inside the cache's __setitem__."""
    import pytest

    from mwas_rfam_spark.functions.bpe import (
        BoundedWordCache,
        encode_text,
        ranks_from_merges,
    )

    cache = BoundedWordCache(3)
    for i in range(10):
        cache[f"w{i}"] = [f"w{i}"]
        assert len(cache) <= 3
    # hot-word repopulation still works after a clear
    cache["hot"] = ["hot"]
    assert cache["hot"] == ["hot"]

    # encoding through a tiny bounded cache matches the uncached result
    ranks = ranks_from_merges([("a", "b"), ("ab", "c")])
    text = " ".join(f"word{i} abc" for i in range(50))
    assert encode_text(text, ranks, BoundedWordCache(2)) == encode_text(text, ranks)

    with pytest.raises(ValueError, match="cap must be >= 1"):
        BoundedWordCache(0)


def test_bpe_encode_loud_on_missing_and_colliding_columns(spark):
    """r13 review finding (same class as the r12 asof right_cols fix):
    a passthrough named after a generated output column built a
    duplicate-field schema that failed executor-side with a cryptic
    Arrow column-count mismatch, and a missing id/passthrough column was
    a bare KeyError from docs.schema[c]."""
    from mwas_rfam_spark.operators.tokenize import (
        bpe_encode,
        bpe_token_budget_counts,
        train_bpe_merges,
    )

    docs = spark.createDataFrame(
        [(1, "aa bb", 7)], "doc_id long, text string, n_tokens long"
    )
    merges = train_bpe_merges(docs.select("doc_id", "text"), num_merges=4)
    with pytest.raises(ValueError, match="collide with generated"):
        bpe_encode(docs, merges, passthrough_cols=["n_tokens"])
    with pytest.raises(ValueError, match="collide with generated"):
        bpe_token_budget_counts(docs, merges, group_col="n_tokens")
    with pytest.raises(ValueError, match="not in input"):
        bpe_encode(docs, merges, passthrough_cols=["no_such"])
    with pytest.raises(ValueError, match="not in input"):
        bpe_encode(docs, merges, id_col="missing_id")


def test_bpe_vocab_alphabet_excludes_unicode_whitespace(spark):
    """r13 review finding: the ASCII-only ^\\s$ filter let NBSP/NEL and
    the C0 separators into the base alphabet as token ids the encoder
    can never emit, displacing real tokens."""
    from mwas_rfam_spark.operators.tokenize import bpe_vocab, train_bpe_merges

    docs = spark.createDataFrame(
        [(1, "ab\xa0cd\x1cef\x85gh　ij")], "doc_id long, text string"
    )
    merges = train_bpe_merges(docs, num_merges=2)
    toks = {r["token"] for r in bpe_vocab(merges, docs).collect()}
    for ws in ("\xa0", "\x1c", "\x85", "　", " "):
        assert ws not in toks, f"whitespace {ws!r} leaked into the alphabet"
    for ch in "abcdefghij":
        assert ch in toks
