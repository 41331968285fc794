"""Edit-distance fuzzy join: brute-force parity (Python reference and
DuckDB's levenshtein over the same parquet), short-string edge cases,
and the blocking invariants."""

import itertools
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from mwas_rfam_spark.operators.fuzzy import edit_distance_join, edit_distance_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _corpus(seed: int = 11) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    words = [
        "spark", "sparks", "spork", "catalyst", "catalist",
        "", "a", "ab", "abc", "tungsten", "tungstan", "tungsten ", "x" * 40,
    ]
    for _ in range(60):
        s = "".join(rng.choice("abcde ") for _ in range(rng.randrange(0, 25)))
        words.append(s)
        if s and rng.random() < 0.5:
            pos = rng.randrange(len(s))
            words.append(s[:pos] + rng.choice("abcdez") + s[pos + 1 :])
        if s and rng.random() < 0.3:
            pos = rng.randrange(len(s))
            words.append(s[:pos] + s[pos + 1 :])
    return list(enumerate(words))


@pytest.mark.parametrize("d", [1, 2, 3])
def test_self_pairs_match_bruteforce(spark, d):
    rows = _corpus()
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(docs, max_dist=d, normalize=False).collect()
    }
    want = {
        (min(i, j), max(i, j), _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= d
    }
    assert got == want


@pytest.mark.parametrize("d", [1, 2])
def test_rs_join_matches_bruteforce(spark, d):
    rows = _corpus(seed=5)
    left = spark.createDataFrame(rows[:40], ["doc_id", "text"])
    right = spark.createDataFrame(rows[30:], ["doc_id", "text"])
    got = {
        (r["left_id"], r["right_id"], r["dist"])
        for r in edit_distance_join(left, right, max_dist=d, normalize=False).collect()
    }
    want = {
        (i, j, _lev(a, b))
        for i, a in rows[:40]
        for j, b in rows[30:]
        if _lev(a, b) <= d
    }
    assert got == want


def test_short_strings_and_empties(spark):
    """Strings of length <= d have no pigeonhole guarantee (the whole
    string can be rewritten) — the length-window fallback must still
    find every pair, in both id orders."""
    rows = [(1, ""), (2, "a"), (3, "b"), (4, "ab"), (5, "xy"), (6, "abcdef"), (0, "c")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(docs, max_dist=1, normalize=False).collect()
    }
    want = {
        (min(i, j), max(i, j), _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= 1
    }
    assert got == want
    assert (1, 2, 1) in got and (0, 1, 1) in got  # empty<->1-char, short id on either side


def test_normalization_and_validation(spark):
    docs = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "hello worlds"), (4, None)],
        ["doc_id", "text"],
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_pairs(docs, max_dist=1).collect()
    }
    # normalized forms collapse case/whitespace: 1==2, both 1 edit from 3
    assert got == {(1, 2): 0, (1, 3): 1, (2, 3): 1}
    raw = edit_distance_pairs(docs, max_dist=1, normalize=False).collect()
    assert {(r["id_a"], r["id_b"]) for r in raw} == {(2, 3)}
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_pairs(docs, max_dist=0)
    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_join(docs, docs, max_dist=-1)


def test_duckdb_parity_on_documents(spark, sf_dir):
    """Cross-engine parity on the real documents table: 15-char
    prefixes (short enough that the corpus has genuine near-collisions
    and the all-pairs oracle stays cheap) at d=2, Spark's blocked plan
    vs DuckDB's brute-force levenshtein."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.substring("text", 1, 15).alias("text"))
    )
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(docs, max_dist=2).collect()
    }
    con = duckdb.connect()
    want = {
        (r[0], r[1], r[2])
        for r in con.execute(
            f"""
            WITH t AS (
              SELECT doc_id,
                     regexp_replace(lower(trim(substring(text, 1, 15))),
                                    '\\s+', ' ', 'g') AS s
              FROM read_parquet('{sf_dir}/documents.parquet')
            )
            SELECT a.doc_id, b.doc_id, levenshtein(a.s, b.s)
            FROM t a JOIN t b ON a.doc_id < b.doc_id
            WHERE levenshtein(a.s, b.s) <= 2
            """
        ).fetchall()
    }
    con.close()
    assert got == want
    assert len(got) > 0  # the corpus has near-identical prefixes


def test_candidate_exchange_carries_no_strings(spark):
    """The candidate generation + pair dedup shuffle ids and segment
    keys ONLY (r5 verdict task #5): full strings re-join after the
    dedup. Before the fix, dropDuplicates carried both strings, which
    the plan shows as first(s_s)/first(s_t) aggregates — assert they
    are gone (for both the self-join and the R-S join)."""
    rows = [(i, f"some realistic length document field value {i}") for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    plan = (
        edit_distance_pairs(docs, max_dist=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "first(s_s" not in plan and "first(s_t" not in plan
    plan_rs = (
        edit_distance_join(docs, docs, max_dist=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "first(left_s" not in plan_rs and "first(right_s" not in plan_rs


def test_blocking_is_not_allpairs(spark):
    """Plan shape: the candidate path joins on (src_len, slot, seg) —
    no CartesianProduct / BroadcastNestedLoop anywhere except the
    d-bounded short-string fallback's broadcast."""
    rows = [(i, f"completely distinct document number {i} padding") for i in range(50)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    plan = edit_distance_pairs(docs, max_dist=1)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# --------------------------------------------------- containment pairs


def test_containment_pairs_bruteforce_and_asymmetry(spark):
    """Quote-inclusion shape: short doc embedded in a long one scores
    containment 1.0 but low Jaccard; brute-force parity over a mixed
    corpus; the exact (max_df=None) join is verified."""
    import itertools

    from mwas_rfam_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, quote),
        (2, "intro paragraph here . " + quote + " . and a very long tail " +
            " ".join(f"word{i}" for i in range(40))),
        (3, "totally unrelated content about spark catalyst tungsten and more filler text"),
        (4, quote + " with one extra"),
        (5, "the quick brown fox"),  # too short for full containment of others
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    def shingles(t, n=3):
        # word_shingles is case-sensitive (matching the registered
        # jaccard oracles) — the reference model must be too
        toks = t.split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    t = 0.8
    want = set()
    for (i, a), (j, b) in itertools.permutations(rows, 2):
        sa, sb = shingles(a), shingles(b)
        if sa and len(sa & sb) / len(sa) >= t:
            want.add((i, j, round(len(sa & sb) / len(sa), 6)))
    got = {
        (r["id_contained"], r["id_container"], r["containment"])
        for r in ngram_containment_pairs(docs, n=3, threshold=t, max_df=None).collect()
    }
    assert got == want
    assert (1, 2, 1.0) in got  # the quote IS contained
    # and Jaccard misses it at the same bar
    jac = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, n=3, threshold=t, max_df=None).collect()
    }
    assert (1, 2) not in jac

    import pytest

    with pytest.raises(ValueError, match="threshold"):
        ngram_containment_pairs(docs, threshold=0.0)


def test_containment_duckdb_parity_on_documents(spark, sf_dir):
    import duckdb

    from mwas_rfam_spark.operators.dedup import ngram_containment_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.substring("text", 1, 120).alias("text")
    )
    got = {
        (r["id_contained"], r["id_container"], r["containment"])
        for r in ngram_containment_pairs(docs, n=3, threshold=0.7, max_df=None).collect()
    }
    con = duckdb.connect()
    want = {
        (r[0], r[1], r[2])
        for r in con.execute(
            f"""
            WITH t AS (
              SELECT doc_id,
                     string_split(regexp_replace(trim(substring(text,1,120)),
                                                 '\\s+', ' ', 'g'), ' ') AS toks
              FROM read_parquet('{sf_dir}/documents.parquet')
            ),
            sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                     )) AS s
              FROM t WHERE len(toks) >= 3
            )
            SELECT a.doc_id, b.doc_id,
                   round(len(list_intersect(a.s, b.s))::DOUBLE / len(a.s), 6)
            FROM sh a JOIN sh b ON a.doc_id != b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(a.s) >= 0.7
            """
        ).fetchall()
    }
    con.close()
    assert got == want
    assert len(got) > 0


def test_fp_ceil_boundary_pairs_not_dropped(spark):
    """ceil(0.7*10) is 8 in doubles — before the _fp_ceil guard the
    prefix window and size filters demanded one extra shared shingle
    and silently dropped pairs sitting EXACTLY at the threshold."""
    from mwas_rfam_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    shared = [f"sh{i}" for i in range(7)]
    uniq = [f"aa{i}" for i in range(3)]  # df=1: ranked into A's prefix
    doc_a = " ".join(uniq + shared)      # 10 distinct 1-gram shingles
    doc_b = " ".join(shared)             # exactly the 7 shared
    docs = spark.createDataFrame([(1, doc_a), (2, doc_b)], ["doc_id", "text"])

    cont = {
        (r["id_contained"], r["id_container"]): r["containment"]
        for r in ngram_containment_pairs(docs, n=1, threshold=0.7, max_df=None).collect()
    }
    assert cont[(1, 2)] == 0.7  # the exact-boundary direction
    assert cont[(2, 1)] == 1.0

    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=1, threshold=0.7, max_df=None).collect()
    }
    assert jac == {(1, 2): 0.7}  # J = 7/10 exactly at t
