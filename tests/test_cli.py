"""End-to-end CLI test: CSV in → partitioned results out, reference-flag
surface (main/mwas_general.py:703-788 analog)."""

import csv

import pytest

from mwas_rfam_spark.__main__ import main
from mwas_rfam_spark.sources.readers import melt_wide_metadata


def test_cli_end_to_end(spark, tmp_path):
    # input CSV with arbitrary headers (positional semantics)
    input_csv = tmp_path / "input.csv"
    with open(input_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["acc", "grp", "count"])
        for i in range(1, 7):
            w.writerow([f"R{i}", "g1", 10.0 * i])

    catalog = spark.createDataFrame(
        [("P1", f"SAM0{i}", f"R{i}", 1_000_000) for i in range(1, 7)],
        "bio_project string, bio_sample string, run string, spots long",
    )
    cat_path = str(tmp_path / "catalog")
    catalog.write.parquet(cat_path)

    wide = spark.createDataFrame(
        [(f"SAM0{i}", "a" if i <= 3 else "b", "x" if i % 2 else "y") for i in range(1, 7)],
        ["biosample_id", "t1", "t2"],
    )
    meta_path = str(tmp_path / "meta")
    melt_wide_metadata(wide, "P1").write.parquet(meta_path)

    out = str(tmp_path / "results")
    rc = main(
        [
            str(input_csv),
            "--catalog", cat_path,
            "--metadata-long", meta_path,
            "--output", out,
            "--t-test-only",
            "--p-value-threshold", "0.5",
        ],
        spark=spark,
    )
    assert rc == 0
    back = spark.read.option("header", True).csv(out)
    assert back.count() > 0
    assert "p_value" in back.columns and "bioproject" in back.columns
    import os
    assert any(d.startswith("bioproject=") for d in os.listdir(out))


def test_cli_cached_rerun(spark, tmp_path):
    input_csv = tmp_path / "in2.csv"
    with open(input_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["run", "group", "q"])
        for i in range(1, 7):
            w.writerow([f"R{i}", "g1", 5.0 * i])
    catalog = spark.createDataFrame(
        [("P1", f"SAM0{i}", f"R{i}", 1_000_000) for i in range(1, 7)],
        "bio_project string, bio_sample string, run string, spots long",
    )
    cat_path = str(tmp_path / "cat2")
    catalog.write.parquet(cat_path)
    wide = spark.createDataFrame(
        [(f"SAM0{i}", "a" if i <= 3 else "b", "x" if i % 2 else "y") for i in range(1, 7)],
        ["biosample_id", "t1", "t2"],
    )
    meta_path = str(tmp_path / "meta2")
    melt_wide_metadata(wide, "P1").write.parquet(meta_path)

    cache = str(tmp_path / "cache")
    args = [
        str(input_csv), "--catalog", cat_path, "--metadata-long", meta_path,
        "--t-test-only", "--cache-dir", cache,
    ]
    assert main(args + ["--output", str(tmp_path / "o1")], spark=spark) == 0
    import os
    assert len(os.listdir(cache)) == 1
    # rerun hits the cache (same fingerprint) and still writes output
    assert main(args + ["--output", str(tmp_path / "o2")], spark=spark) == 0
    assert len(os.listdir(cache)) == 1
    a = spark.read.option("header", True).csv(str(tmp_path / "o1"))
    b = spark.read.option("header", True).csv(str(tmp_path / "o2"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_cli_legacy_and_accounting(spark, tmp_path):
    input_csv = tmp_path / "in3.csv"
    with open(input_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["run", "group", "q"])
        for i in range(1, 7):
            w.writerow([f"R{i}", "g1", 7.0 * i])
    catalog = spark.createDataFrame(
        [("P1", f"SAM0{i}", f"R{i}", 1_000_000) for i in range(1, 7)],
        "bio_project string, bio_sample string, run string, spots long",
    )
    cat_path = str(tmp_path / "cat3")
    catalog.write.parquet(cat_path)
    wide = spark.createDataFrame(
        [(f"SAM0{i}", "a" if i <= 3 else "b") for i in range(1, 7)],
        ["biosample_id", "t1"],
    )
    meta_path = str(tmp_path / "meta3")
    melt_wide_metadata(wide, "P1").write.parquet(meta_path)

    out = str(tmp_path / "res3")
    rc = main(
        [
            str(input_csv),
            "--catalog", cat_path,
            "--metadata-long", meta_path,
            "--output", out,
            "--t-test-only",
            "--legacy-output",
            "--accounting",
        ],
        spark=spark,
    )
    assert rc == 0
    acc = spark.read.option("header", True).csv(f"{out}/_accounting")
    rows = {r["bioproject"]: r for r in acc.collect()}
    assert rows["P1"]["status"] == "ok"
    assert int(rows["P1"]["n_sets"]) >= 1


def test_read_documents_jsonl_quarantine(spark, tmp_path):
    """Well-formed rows parse against the explicit schema; malformed lines
    land in _corrupt_record instead of failing the read."""
    from mwas_rfam_spark.sources.readers import read_documents_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}\n'
        '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web"}\n'
        "this is not json at all\n"
    )
    df = read_documents_jsonl(spark, str(p)).cache()
    clean = df.where("_corrupt_record IS NULL")
    bad = df.where("_corrupt_record IS NOT NULL")
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}
    assert bad.count() == 1
    assert "not json" in bad.collect()[0]["_corrupt_record"]


def test_read_documents_text_modes(spark, tmp_path):
    from mwas_rfam_spark.sources.readers import read_documents_text

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("doc a line one\ndoc a line two")
    (d / "b.txt").write_text("doc b")
    whole = read_documents_text(spark, str(d)).collect()
    assert len(whole) == 2
    # doc_id is BIGINT in BOTH modes (DOCUMENTS_SCHEMA) — the path moves
    # to `source`
    assert all(isinstance(r["doc_id"], int) for r in whole)
    texts = {r["source"].rsplit("/", 1)[-1]: r["text"] for r in whole}
    assert texts["a.txt"] == "doc a line one\ndoc a line two"
    assert len({r["doc_id"] for r in whole}) == 2  # xxhash64(path) distinct
    lines = read_documents_text(spark, str(d), whole_file=False)
    assert lines.count() == 3
    assert lines.select("doc_id").distinct().count() == 3
    assert dict(lines.dtypes)["doc_id"] == "bigint"


def test_cli_curate_end_to_end(spark, tmp_path):
    """`python -m mwas_rfam_spark curate`: JSONL in -> sharded parquet out
    with stage accounting, decontamination against a benchmark parquet."""
    from mwas_rfam_spark.__main__ import main

    src = tmp_path / "docs.jsonl"
    lines = [
        '{"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta"}',
        '{"doc_id": 2, "text": "alpha beta gamma delta epsilon zeta"}',  # dup
        '{"doc_id": 3, "text": "tiny"}',                                  # quality
        '{"doc_id": 4, "text": "the bench mark secret answer string"}',   # contaminated
        '{"doc_id": 5, "text": "call me at 555-123-4567 ok thanks all"}', # kept+redacted
        "not json",
    ]
    src.write_text("\n".join(lines) + "\n")
    bench = tmp_path / "bench"
    spark.createDataFrame(
        [(100, "the bench mark secret answer string")], "doc_id long, text string"
    ).write.parquet(str(bench))

    out = str(tmp_path / "curated")
    rc = main(
        [
            "curate", str(src),
            "--input-format", "jsonl",
            "--output", out,
            "--benchmark", str(bench),
            "--min-tokens", "5",
            "--decontam-n", "5",
            "--decontam-threshold", "0.2",
            "--shards", "2",
            "--accounting",
        ],
        spark=spark,
    )
    assert rc == 0
    back = spark.read.parquet(out)
    rows = {r["doc_id"]: r for r in back.collect()}
    assert set(rows) == {1, 5}
    assert "[PHONE]" in rows[5]["text"]
    assert {r["shard"] for r in rows.values()} <= {0, 1}
    acct = spark.read.option("header", True).csv(f"{out}/_accounting")
    counts = {r["drop_stage"]: int(r["count"]) for r in acct.collect()}
    assert counts == {"kept": 2, "duplicate": 1, "quality": 1, "contaminated": 1}


def test_cli_maintain_upsert_and_compact(spark, tmp_path):
    """`python -m mwas_rfam_spark maintain upsert|compact` end-to-end."""
    from pyspark.sql import functions as F

    from mwas_rfam_spark.__main__ import main

    base = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, f"text {i}", chr(ord("a") + i % 2)) for i in range(40)],
        ["doc_id", "text", "p"],
    ).repartition(10).write.partitionBy("p").parquet(base)

    upd = str(tmp_path / "updates")
    spark.createDataFrame(
        [(0, "FIXED", "a"), (999, "NEW", "b")], ["doc_id", "text", "p"]
    ).write.parquet(upd)
    rc = main(
        ["maintain", "upsert", base, "--updates", upd,
         "--key", "doc_id", "--partition-col", "p"],
        spark=spark,
    )
    assert rc == 0
    back = spark.read.parquet(base)
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got[0] == "FIXED" and got[999] == "NEW" and len(got) == 41

    rc = main(
        ["maintain", "compact", base, "--target-rows", "100",
         "--partition-col", "p"],
        spark=spark,
    )
    assert rc == 0
    import glob

    files = glob.glob(f"{base}/**/*.parquet", recursive=True)
    assert len(files) <= 4
    assert spark.read.parquet(base).count() == 41


def test_cli_select_end_to_end(spark, tmp_path):
    """`python -m mwas_rfam_spark select dsir|quality|cluster` end-to-end."""
    from mwas_rfam_spark.__main__ import main

    raw = str(tmp_path / "raw")
    tgt = str(tmp_path / "tgt")
    spark.createDataFrame(
        [(i, "solar energy panels in sunlight") for i in range(20)]
        + [(100 + i, "chocolate cake recipe with butter") for i in range(20)],
        ["doc_id", "text"],
    ).write.parquet(raw)
    spark.createDataFrame(
        [(i, "solar panels generate clean energy") for i in range(10)],
        ["doc_id", "text"],
    ).write.parquet(tgt)

    out = str(tmp_path / "selected")
    rc = main(
        ["select", "dsir", raw, "--target", tgt, "--output", out,
         "-k", "15", "--seed", "3", "--temperature", "0.05"],
        spark=spark,
    )
    assert rc == 0
    sel = spark.read.parquet(out)
    assert sel.count() == 15
    # low temperature: the on-topic half dominates the selection
    assert sel.where("doc_id < 100").count() >= 14

    # quality gate: an empty weight model scores every doc sigmoid(bias)
    wts = str(tmp_path / "weights")
    spark.createDataFrame([], "bucket INT, weight DOUBLE").write.parquet(wts)
    out_q = str(tmp_path / "quality")
    rc = main(
        ["select", "quality", raw, "--weights", wts, "--output", out_q,
         "--bias", "1.0", "--threshold", "0.6"],
        spark=spark,
    )
    assert rc == 0
    assert spark.read.parquet(out_q).count() == 40  # sigmoid(1.0) ≈ 0.73 ≥ 0.6

    emb = str(tmp_path / "emb")
    spark.createDataFrame(
        [(i, [float(i % 4), float((i * 7) % 5)]) for i in range(60)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    ).write.parquet(emb)
    out_c = str(tmp_path / "clustered")
    rc = main(
        ["select", "cluster", emb, "--output", out_c,
         "--clusters", "4", "--per-cluster", "5"],
        spark=spark,
    )
    assert rc == 0
    cs = spark.read.parquet(out_c)
    assert 0 < cs.count() <= 20
    per = cs.groupBy("cell").count().collect()
    assert all(r["count"] <= 5 for r in per)


def test_cli_validate_end_to_end(spark, tmp_path):
    """`python -m mwas_rfam_spark validate` gates on a JSON rule file:
    exit 1 + quarantine on violations, exit 0 on a clean table."""
    import json

    from mwas_rfam_spark.__main__ import main

    path = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(1, "en"), (2, None), (2, "fr")], ["doc_id", "lang"]
    ).write.parquet(path)
    rules = str(tmp_path / "rules.json")
    with open(rules, "w") as f:
        json.dump(
            {"rules": [{"type": "not_null", "col": "lang"}],
             "unique": [["doc_id"]]},
            f,
        )
    quar = str(tmp_path / "bad")
    rc = main(["validate", path, "--rules", rules, "--quarantine", quar], spark=spark)
    assert rc == 1
    bad = spark.read.parquet(quar)
    assert bad.count() == 2  # the null-lang row + the duplicate id row

    clean = str(tmp_path / "clean")
    spark.createDataFrame([(1, "en"), (2, "fr")], ["doc_id", "lang"]).write.parquet(clean)
    rc = main(["validate", clean, "--rules", rules], spark=spark)
    assert rc == 0

    # foreign-key constraint against a second parquet table
    ref = str(tmp_path / "ref")
    spark.createDataFrame([(1,)], ["id"]).write.parquet(ref)
    rules_fk = str(tmp_path / "rules_fk.json")
    with open(rules_fk, "w") as f:
        json.dump(
            {"foreign_keys": [{"col": "doc_id", "ref": ref, "ref_col": "id"}]},
            f,
        )
    rc = main(["validate", clean, "--rules", rules_fk], spark=spark)
    assert rc == 1  # doc_id 2 has no reference row


def test_cli_split(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from mwas_rfam_spark.__main__ import main

    path = str(tmp_path / "docs_split")
    spark.range(1000).withColumnRenamed("id", "doc_id").withColumn(
        "text", F.lit("x")
    ).write.parquet(path)
    out = str(tmp_path / "split_out")
    rc = main(
        ["split", path, "--output", out, "--fractions", "train=0.8,test=0.2"],
        spark=spark,
    )
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.count() == 1000
    labels = {r["split"] for r in got.select("split").distinct().collect()}
    assert labels == {"train", "test"}

    # leakage-safe: clusters of 10 consecutive ids stay together
    cl = str(tmp_path / "clusters")
    spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") - F.col("id") % 10).alias("cluster_id"),
    ).write.parquet(cl)
    out2 = str(tmp_path / "split_out2")
    rc = main(
        ["split", path, "--output", out2, "--fractions", "train=0.8,test=0.2",
         "--clusters", cl],
        spark=spark,
    )
    assert rc == 0
    viol = (
        spark.read.parquet(out2)
        .select((F.col("doc_id") - F.col("doc_id") % 10).alias("c"), "split")
        .groupBy("c")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
    )
    assert viol.count() == 0


def test_cli_validate_expr_rule(spark, tmp_path):
    """rules.json 'expr' type: cross-column SQL constraints reach the
    CLI (the library's satisfies() escape hatch)."""
    import json

    from mwas_rfam_spark.__main__ import main

    path = str(tmp_path / "xcol")
    spark.createDataFrame(
        [(1, 10, 20), (2, 30, 5), (3, 1, 2)], ["doc_id", "lo", "hi"]
    ).write.parquet(path)
    rules = str(tmp_path / "xrules.json")
    with open(rules, "w") as f:
        json.dump(
            {"rules": [{"type": "expr", "name": "lo_below_hi", "sql": "lo < hi"}]},
            f,
        )
    quar = str(tmp_path / "xbad")
    rc = main(["validate", path, "--rules", rules, "--quarantine", quar], spark=spark)
    assert rc == 1
    bad = spark.read.parquet(quar).collect()
    assert len(bad) == 1 and bad[0]["doc_id"] == 2
    assert "lo_below_hi" in bad[0]["violations"]


def test_drift_cli(spark, tmp_path, capsys):
    import random

    rng = random.Random(5)
    a = spark.createDataFrame(
        [(rng.gauss(0, 1), "en" if i % 4 else "de") for i in range(200)],
        "score double, lang string",
    )
    b = spark.createDataFrame(
        [(rng.gauss(4, 1), "fr") for _ in range(200)], "score double, lang string"
    )
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    a.write.parquet(pa)
    b.write.parquet(pb)
    rep_out = str(tmp_path / "rep")

    rc = main(
        ["drift", pa, pb, "--numeric", "score", "--categorical", "lang",
         "--output", rep_out],
        spark=spark,
    )
    assert rc == 0  # flagged but --fail-on-drift not set
    printed = capsys.readouterr().out
    assert "DRIFT" in printed and "score" in printed
    back = {r["column"]: r for r in spark.read.parquet(rep_out).collect()}
    assert back["score"]["flagged"] is True and back["lang"]["flagged"] is True

    rc = main(
        ["drift", pa, pb, "--numeric", "score", "--fail-on-drift"], spark=spark
    )
    assert rc == 2
    rc = main(["drift", pa, pa, "--numeric", "score", "--fail-on-drift"], spark=spark)
    assert rc == 0

    import pytest

    with pytest.raises(SystemExit):
        main(["drift", pa, pb], spark=spark)  # no columns named


def test_tokenize_cli(spark, tmp_path, capsys):
    docs = spark.createDataFrame(
        [(i, "repeated phrase corpus text " * 3) for i in range(30)],
        ["doc_id", "text"],
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    out = str(tmp_path / "enc")
    merges_path = str(tmp_path / "merges")

    rc = main(
        ["tokenize", src, "--output", out, "--num-merges", "40",
         "--sample-docs", "30", "--save-merges", merges_path],
        spark=spark,
    )
    assert rc == 0
    assert "encoded 30 docs" in capsys.readouterr().out
    enc = spark.read.parquet(out)
    assert set(enc.columns) == {"doc_id", "n_tokens"}
    assert enc.count() == 30 and enc.where("n_tokens <= 0").count() == 0

    # re-encode with the SAVED merges (skip training) — identical output
    out2 = str(tmp_path / "enc2")
    rc = main(
        ["tokenize", src, "--output", out2, "--merges", merges_path,
         "--emit-tokens"],
        spark=spark,
    )
    assert rc == 0
    enc2 = spark.read.parquet(out2)
    assert "tokens" in enc2.columns
    j = enc.withColumnRenamed("n_tokens", "n1").join(enc2, "doc_id")
    assert j.where("n1 != n_tokens").count() == 0

    # --corpus-stats: trained from the distributed word-frequency
    # aggregate; every doc is identical here, so the sample-trained and
    # corpus-trained tables must agree
    out3 = str(tmp_path / "enc3")
    merges3 = str(tmp_path / "merges3")
    rc = main(
        ["tokenize", src, "--output", out3, "--num-merges", "40",
         "--corpus-stats", "--save-merges", merges3],
        spark=spark,
    )
    assert rc == 0
    assert sorted(map(tuple, spark.read.parquet(merges3).collect())) == sorted(
        map(tuple, spark.read.parquet(merges_path).collect())
    )


def test_diff_cli(spark, tmp_path, capsys):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, "d")], "doc_id long, text string"
    )
    po, pn = str(tmp_path / "old"), str(tmp_path / "new")
    old.write.parquet(po)
    new.write.parquet(pn)
    detail = str(tmp_path / "detail")
    rc = main(["diff", po, pn, "--output", detail], spark=spark)
    assert rc == 0
    printed = dict(
        line.split("\t") for line in capsys.readouterr().out.strip().splitlines()
    )
    assert printed == {"added": "1", "removed": "1", "changed": "1", "unchanged": "1"}
    back = {r["doc_id"]: r["status"] for r in spark.read.parquet(detail).collect()}
    assert back == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_fuzzy_cli(spark, tmp_path, capsys):
    docs = spark.createDataFrame(
        [(1, "spark"), (2, "spork"), (3, "Spark"), (4, "entirely different")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "fdocs")
    docs.write.parquet(src)
    out = str(tmp_path / "pairs")
    rc = main(["fuzzy", src, "--output", out, "--max-dist", "1"], spark=spark)
    assert rc == 0
    assert "pair(s) within distance 1" in capsys.readouterr().out
    pairs = {(r["id_a"], r["id_b"]): r["dist"] for r in spark.read.parquet(out).collect()}
    # normalized: 1==3 (case), both 1 edit from 2
    assert pairs == {(1, 2): 1, (1, 3): 0, (2, 3): 1}

    # R-S form against a reference list
    ref = spark.createDataFrame([(100, "spark")], "doc_id long, text string")
    refp = str(tmp_path / "ref")
    ref.write.parquet(refp)
    out2 = str(tmp_path / "pairs2")
    rc = main(
        ["fuzzy", src, "--right", refp, "--output", out2, "--max-dist", "1"],
        spark=spark,
    )
    assert rc == 0
    got = {(r["left_id"], r["right_id"]) for r in spark.read.parquet(out2).collect()}
    assert got == {(1, 100), (2, 100), (3, 100)}


def test_index_cli_build_and_append(spark, tmp_path, capsys):
    docs = spark.createDataFrame(
        [(i, f"the data pipeline document {i}") for i in range(30)],
        "doc_id long, text string",
    )
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    docs.where("doc_id < 20").write.parquet(a)
    docs.where("doc_id >= 20").write.parquet(b)
    idx = str(tmp_path / "tidx")
    assert main(["index", "text", "build", a, "--path", idx, "--buckets", "8"], spark=spark) == 0
    assert main(["index", "text", "append", b, "--path", idx], spark=spark) == 0
    from mwas_rfam_spark.operators.retrieval import bm25_topk_indexed

    got = bm25_topk_indexed(spark, idx, ["data", "pipeline"], k=30)
    assert got.count() == 30  # all docs found, including the appended ones

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3), 1.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    ea, eb = str(tmp_path / "ea"), str(tmp_path / "eb")
    emb.where("vec_id < 30").write.parquet(ea)
    emb.where("vec_id >= 30").write.parquet(eb)
    aidx = str(tmp_path / "aidx")
    assert main(
        ["index", "ann", "build", ea, "--path", aidx, "--cells", "4", "--iters", "1"],
        spark=spark,
    ) == 0
    assert main(["index", "ann", "append", eb, "--path", aidx], spark=spark) == 0
    assert spark.read.parquet(f"{aidx}/vectors").count() == 40

    # --- remove op: feed the departed slices back (the diff's removed
    # half); both indexes shrink to exactly the remainder
    assert main(["index", "text", "remove", b, "--path", idx], spark=spark) == 0
    got = bm25_topk_indexed(spark, idx, ["data", "pipeline"], k=30)
    assert got.count() == 20 and got.where("doc_id >= 20").count() == 0
    assert main(["index", "ann", "remove", eb, "--path", aidx], spark=spark) == 0
    remaining = spark.read.parquet(f"{aidx}/vectors")
    assert remaining.count() == 30 and remaining.where("vec_id >= 30").count() == 0


def test_search_cli(spark, tmp_path, capsys):
    docs = spark.createDataFrame(
        [(1, "data pipeline"), (2, "data"), (3, "unrelated words")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "sdocs")
    docs.write.parquet(src)
    idx = str(tmp_path / "sidx")
    assert main(["index", "text", "build", src, "--path", idx], spark=spark) == 0
    capsys.readouterr()  # drain the index build's status line
    out = str(tmp_path / "sres")
    rc = main(
        ["search", idx, "--terms", "data, pipeline", "-k", "5", "--output", out],
        spark=spark,
    )
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2  # docs 1 and 2 match; doc 1 ranks first
    assert lines[0].startswith("1\t")
    back = spark.read.parquet(out)
    assert back.count() == 2 and set(back.columns) == {"doc_id", "score", "n_matched"}


def test_report_cli(spark, tmp_path, capsys):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta"), (3, ""), (4, "alpha beta gamma")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "rdocs")
    docs.write.parquet(src)
    out = str(tmp_path / "rep")
    rc = main(["report", src, "--output", out], spark=spark)
    assert rc == 0
    printed = dict(
        line.split("\t", 1) for line in capsys.readouterr().out.strip().splitlines()
    )
    assert printed["n_docs"] == "4"
    back = spark.read.parquet(out).first()
    assert back["n_docs"] == 4


def test_cli_pack(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from mwas_rfam_spark.__main__ import main

    path = str(tmp_path / "docs_pack")
    spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.array_repeat(F.lit("tok"), (F.pmod(F.col("id"), 50) + 1).cast("int"))
        ).alias("text"),
    ).write.parquet(path)

    out = str(tmp_path / "packs_bin")
    rc = main(
        ["pack", path, "--output", out, "--max-tokens", "100", "--mode", "bin",
         "--n-buckets", "4"],
        spark=spark,
    )
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.count() == 200
    fills = got.where(~F.col("oversize")).groupBy("pack_id").agg(
        F.sum("n_tokens").alias("fill")
    )
    assert fills.where(F.col("fill") > 100).count() == 0
    assert "avg_fill=" in capsys.readouterr().out

    out2 = str(tmp_path / "packs_chunk")
    rc = main(
        ["pack", path, "--output", out2, "--max-tokens", "100", "--mode", "chunk"],
        spark=spark,
    )
    assert rc == 0
    assert spark.read.parquet(out2).count() == 200
    assert "chunks" in capsys.readouterr().out


def test_cli_pack_chunk_count_includes_interior_chunks(spark, tmp_path, capsys):
    """A doc longer than 2x the budget has chunks no pack_id row marks;
    the CLI's chunk count must include them (sum of per-bucket max
    ordinals, not countDistinct)."""
    from pyspark.sql import functions as F

    from mwas_rfam_spark.__main__ import main

    path = str(tmp_path / "docs_long")
    spark.createDataFrame(
        [(1, " ".join(["t"] * 50)), (2, " ".join(["t"] * 250))],
        "doc_id long, text string",
    ).write.parquet(path)
    out = str(tmp_path / "chunks_long")
    rc = main(
        ["pack", path, "--output", out, "--max-tokens", "100", "--mode", "chunk",
         "--n-buckets", "1"],
        spark=spark,
    )
    assert rc == 0
    # 300 tokens in one bucket at budget 100 → 3 chunks
    assert "into 3 chunks" in capsys.readouterr().out


def test_cli_select_mix(spark, tmp_path, capsys):
    """`select mix`: temperature rebalancing end-to-end + report-only."""
    from mwas_rfam_spark.__main__ import main

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, "t", "big") for i in range(90)] + [(100 + i, "t", "small") for i in range(10)],
        "doc_id int, text string, source string",
    ).write.parquet(src)
    out = str(tmp_path / "mixed")
    rc = main(
        ["select", "mix", src, "--output", out, "--alpha", "0", "--target-rows", "100"],
        spark=spark,
    )
    assert rc == 0
    text = capsys.readouterr().out
    assert "5.00 epochs" in text and "mixed 100 row(s)" in text
    mixed = spark.read.parquet(out)
    per = {r["source"]: r["count"] for r in mixed.groupBy("source").count().collect()}
    assert per == {"big": 50, "small": 50}

    rc = main(
        ["select", "mix", src, "--output", out, "--alpha", "0.5", "--report-only"],
        spark=spark,
    )
    assert rc == 0
    assert "mixed" not in capsys.readouterr().out


def test_cli_drift_embedding_mode(spark, tmp_path, capsys):
    from pyspark.sql import functions as F

    from mwas_rfam_spark.__main__ import main

    base = str(tmp_path / "base")
    cur = str(tmp_path / "cur")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    emb.where("vec_id % 2 = 0").write.parquet(base)
    emb.where("vec_id % 2 = 1").write.parquet(cur)
    rc = main(
        ["drift", base, cur, "--embedding-col", "embedding",
         "--components", "2", "--ks-threshold", "0.2", "--fail-on-drift"],
        spark=spark,
    )
    assert rc == 0  # same distribution: unflagged
    out = capsys.readouterr().out
    assert "pc0" in out and "pc1" in out


def test_search_cli_vector_mode(spark, tmp_path, capsys):
    """`search <ivf index> --queries q.parquet`: batch k-NN join over the
    materialized index; each query's own vector comes back at rank 1."""
    from pyspark.sql import functions as F

    from mwas_rfam_spark.operators.similarity import (
        materialize_ivf,
        train_ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    idx = str(tmp_path / "ivf")
    materialize_ivf(emb, train_ivf_centroids(emb, k=4, iters=1), idx)
    qpath = str(tmp_path / "q")
    emb.orderBy("vec_id").limit(2).write.parquet(qpath)
    out = str(tmp_path / "hits")
    rc = main(
        ["search", idx, "--queries", qpath, "-k", "3", "--nprobe", "2",
         "--output", out],
        spark=spark,
    )
    assert rc == 0
    hits = spark.read.parquet(out)
    assert hits.count() == 6
    top = {(r["q_id"], r["vec_id"]) for r in hits.where("rank = 1").collect()}
    assert top == {(0, 0), (1, 1)}
    text = capsys.readouterr().out
    assert "1.000000" in text

    # exactly one of --terms/--queries
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["search", idx], spark=spark)


def test_index_cli_ivfpq_lifecycle(spark, tmp_path):
    """`index ivfpq build/append/remove` drives the materialized IVF-PQ
    lifecycle end-to-end; search results survive append+remove exactly
    as a rebuild on the same rows would produce."""
    from pyspark.sql import functions as F

    from mwas_rfam_spark.operators.quantization import ivfpq_topk_indexed

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    gone = str(tmp_path / "gone")
    emb.where("vec_id % 3 != 0").write.parquet(a)
    emb.where("vec_id % 3 = 0").write.parquet(b)
    emb.where("vec_id % 5 = 1").write.parquet(gone)

    idx = str(tmp_path / "idx")
    assert main(["index", "ivfpq", "build", a, "--path", idx, "--cells", "4"],
                spark=spark) == 0
    assert main(["index", "ivfpq", "append", b, "--path", idx], spark=spark) == 0
    assert main(["index", "ivfpq", "remove", gone, "--path", idx], spark=spark) == 0

    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    got = [
        (r["vec_id"], round(r["dist"], 6))
        for r in ivfpq_topk_indexed(spark, idx, qv, k=5, nprobe=4, rerank=50).collect()
    ]
    assert len(got) == 5
    # removed ids never surface; vec_id 0 survives (0 % 5 != 1) at dist 0
    assert all(v % 5 != 1 for v, _ in got)
    assert got[0] == (0, 0.0)

    # r11 default decision: the CLI recipe trains its own codebooks, so
    # residual encoding (probe r9o: +86% recall on clustered corpora)
    # is the build default — recorded in meta and honored by append —
    # and --no-residual restores the raw layout
    from mwas_rfam_spark.operators.quantization import _index_is_residual

    assert _index_is_residual(spark, idx) is True
    raw_idx = str(tmp_path / "idx_raw")
    assert main(["index", "ivfpq", "build", a, "--path", raw_idx,
                 "--cells", "4", "--no-residual"], spark=spark) == 0
    assert _index_is_residual(spark, raw_idx) is False


def test_cli_demo_reference_parity(spark, tmp_path):
    """VERDICT r6 task #7: one command runs the reference repo's own
    test inputs end-to-end (positional input scan -> wide->long melt ->
    condensation -> seeded run_mwas) and diffs the 18-column output
    against the pinned golden. Plus: every t-test row's statistic and
    p-value re-derived from the row's own summary stats with plain
    Python (the same closed form scipy's ttest_ind_from_stats uses) —
    an engine-independent check that the pipeline wired the cohort
    stats into the test correctly."""
    import csv
    import math
    import os

    import pytest as _pytest

    from mwas_rfam_spark.__main__ import _demo_golden_path, demo_main

    if not os.path.isdir("/root/reference/main/tests"):
        _pytest.skip("reference corpus not present")

    out_csv = str(tmp_path / "demo_out.csv")
    rc = demo_main(["--output", out_csv], spark)
    assert rc == 0  # PARITY OK against the pinned golden

    from mwas_rfam_spark.functions.stattests import student_t_sf

    n_checked = 0
    with open(out_csv, newline="") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 882 and len(rows[0]) == 18
    for r in rows:
        if not r["status"].startswith("t_test"):
            continue
        n1, n2 = int(r["num_true"]), int(r["num_false"])
        m1, m2 = float(r["mean_rpm_true"]), float(r["mean_rpm_false"])
        s1, s2 = float(r["sd_rpm_true"]), float(r["sd_rpm_false"])
        if n1 < 2 or n2 < 2:
            continue
        vn1, vn2 = s1 * s1 / n1, s2 * s2 / n2
        if vn1 + vn2 == 0:
            continue
        t = (m1 - m2) / math.sqrt(vn1 + vn2)
        assert abs(t - float(r["test_statistic"])) < 1e-6, r
        dfree = (vn1 + vn2) ** 2 / (
            (vn1 * vn1 / (n1 - 1)) + (vn2 * vn2 / (n2 - 1))
        )
        p = 2.0 * student_t_sf(abs(t), dfree)
        assert abs(p - float(r["p_value"])) < 1e-6, r
        n_checked += 1
    assert n_checked >= 100  # the corpus produces a real t-test population

    # FAIL path: a tampered expectation must be caught, not papered over
    tampered = str(tmp_path / "tampered.csv")
    with open(_demo_golden_path(), newline="") as f:
        lines = f.readlines()
    lines[1] = lines[1].replace("PRJDB10214", "PRJXXXXXX")
    with open(tampered, "w", newline="") as f:
        f.writelines(lines)
    assert demo_main(["--expected", tampered], spark) == 1


def test_cli_evaluate(spark, tmp_path):
    """evaluate CLI end-to-end: scored parquet in -> AUC / threshold /
    ECE / per-slice lines out + parquet report."""
    import numpy as np

    from mwas_rfam_spark.__main__ import evaluate_main

    rng = np.random.default_rng(3)
    rows = [
        (float(1 / (1 + np.exp(-(rng.normal() + 1.2 * y)))), int(y), "en" if i % 2 else "ko")
        for i, y in enumerate(rng.integers(0, 2, 300))
    ]
    src = str(tmp_path / "scored")
    spark.createDataFrame(rows, "score double, label int, lang string").write.parquet(src)
    out = str(tmp_path / "rep")
    rc = evaluate_main(
        [src, "--thresholds", "0.3", "0.5", "--group-by", "lang", "--output", out],
        spark,
    )
    assert rc == 0
    rep = spark.read.parquet(out)
    assert rep.count() == 2 and "f1" in rep.columns


def test_cli_evaluate_grouped_ece_lines(spark, tmp_path, capsys):
    """--group-by also prints per-slice ECE (r9: grouped calibration)."""
    from mwas_rfam_spark.__main__ import evaluate_main

    src = str(tmp_path / "scored")
    spark.createDataFrame(
        [(0.1, 0, "en"), (0.9, 1, "en"), (0.4, 1, "ko"), (0.6, 0, "ko")],
        "score double, label int, lang string",
    ).write.parquet(src)
    assert evaluate_main([src, "--group-by", "lang"], spark) == 0
    lines = capsys.readouterr().out.splitlines()
    assert any(line.startswith("ece[lang=en]") for line in lines)
    assert any(line.startswith("ece[lang=ko]") for line in lines)

def test_cli_evaluate_state_mode(spark, tmp_path, capsys):
    """evaluate --state: exact AUC straight from a streaming_eval_counts
    state dir — global line always, per-slice lines when the dir was
    written grouped (key set derived from the stored columns)."""
    from pyspark.sql import functions as F

    from mwas_rfam_spark.__main__ import evaluate_main
    from mwas_rfam_spark.operators.evaluation import (
        binary_auc,
        grouped_per_score_counts,
        per_score_counts,
    )

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "ko", 0.1 * (i % 10), i % 2) for i in range(80)],
        "doc_id long, lang string, score double, label int",
    ).cache()

    gstate = str(tmp_path / "gstate")
    for b in range(2):
        grouped_per_score_counts(
            docs.where(F.col("doc_id") % 2 == b), ["lang"]
        ).write.parquet(f"{gstate}/ingest_batch={b}")
    assert evaluate_main([gstate, "--state"], spark) == 0
    out = capsys.readouterr().out.splitlines()
    want = binary_auc(docs).collect()[0]
    assert out[0].split("\t")[1] == str(want["auc"])
    assert any(line.startswith("auc[lang=en]") for line in out)
    assert any(line.startswith("auc[lang=ko]") for line in out)
    assert any(line.startswith("ece\t") for line in out)
    assert any(line.startswith("ece[lang=en]") for line in out)
    assert any(line.startswith("threshold 0.5") for line in out)

    ustate = str(tmp_path / "ustate")
    per_score_counts(docs).write.parquet(f"{ustate}/ingest_batch=0")
    rep = str(tmp_path / "urep")
    assert evaluate_main([ustate, "--state", "--output", rep], spark) == 0
    out = capsys.readouterr().out.splitlines()
    assert len([line for line in out if line.startswith("auc")]) == 1
    assert any(line.startswith("ece\t") for line in out)
    # --output on an ungrouped state dir writes the global AUC row
    # (r11 review finding: it used to exit without writing)
    urep = spark.read.parquet(rep)
    assert urep.count() == 1 and urep.collect()[0]["auc"] == pytest.approx(
        want["auc"], abs=1e-12
    )


def test_unknown_command_refused_by_name(capsys):
    """r13 review finding: a mistyped subcommand ('evaluat') fell
    through to the MWAS parser as input_csv and died with a misleading
    '--catalog is required'."""
    rc = main(["evaluat", "whatever.parquet"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "unknown command: 'evaluat'" in err and "evaluate" in err


def test_search_cli_custom_index_columns(spark, tmp_path, capsys):
    """r13 review finding: an ANN index built with custom
    --id-col/--vec-col names was unsearchable — search hardcoded
    vec_id/embedding."""
    from pyspark.sql import functions as F

    from mwas_rfam_spark.operators.similarity import (
        materialize_ivf,
        train_ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        F.col("vec_id").alias("item_id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    idx = str(tmp_path / "ivf_custom")
    materialize_ivf(
        emb, train_ivf_centroids(emb, k=4, iters=1, vec_col="vec"), idx,
        id_col="item_id", vec_col="vec",
    )
    qpath = str(tmp_path / "q")
    emb.orderBy("item_id").limit(2).write.parquet(qpath)
    rc = main(
        ["search", idx, "--queries", qpath, "-k", "2", "--nprobe", "2",
         "--q-id-col", "item_id", "--q-vec-col", "vec",
         "--id-col", "item_id", "--vec-col", "vec"],
        spark=spark,
    )
    assert rc == 0
    text = capsys.readouterr().out
    assert "1.000000" in text  # each query finds itself at cosine 1


def test_curate_accounting_single_pipeline_respects_no_redact(spark, tmp_path):
    """r13 review findings: --accounting ran the whole pipeline a second
    time AND dropped the redact flag in that second run. Both outputs now
    derive from ONE mark-mode frame that honors --no-redact."""
    src = tmp_path / "docs"
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "call me at 555-123-4567 ok thanks all"),
            (3, "tiny"),
        ],
        "doc_id long, text string",
    ).write.parquet(str(src))
    out = str(tmp_path / "curated")
    rc = main(
        ["curate", str(src), "--output", out, "--min-tokens", "5",
         "--no-redact", "--accounting"],
        spark=spark,
    )
    assert rc == 0
    rows = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert set(rows) == {1, 2}
    assert "555-123-4567" in rows[2]  # --no-redact honored in kept output
    acct = spark.read.option("header", True).csv(f"{out}/_accounting")
    counts = {r["drop_stage"]: int(r["count"]) for r in acct.collect()}
    assert counts == {"kept": 2, "quality": 1}


def test_validate_unknown_type_and_missing_key_messages(spark, tmp_path):
    """r13 review finding: the missing-key except wrapped the rule
    constructors too; unknown/missing 'type' now diagnoses separately
    from a genuinely missing rule key."""
    import json

    docs = tmp_path / "t"
    spark.createDataFrame([(1,)], "a long").write.parquet(str(docs))

    def run(rules):
        p = tmp_path / "rules.json"
        p.write_text(json.dumps({"rules": rules}))
        return main(["validate", str(docs), "--rules", str(p)], spark=spark)

    with pytest.raises(ValueError, match="unknown rule type: 'nope'"):
        run([{"type": "nope", "col": "a"}])
    with pytest.raises(ValueError, match="unknown rule type: None"):
        run([{"col": "a"}])  # missing 'type' is an unknown type, not a key
    with pytest.raises(ValueError, match=r"rules\[0\] is missing key 'lo'"):
        run([{"type": "in_range", "col": "a", "hi": 5}])


def test_evaluate_state_refuses_row_mode_flags(spark, tmp_path):
    """r13 review finding: evaluate --state silently ignored --group-by /
    --score-col / --label-col, replacing a requested slicing with the
    stored layout."""
    from mwas_rfam_spark.operators.evaluation import per_score_counts

    docs = spark.createDataFrame(
        [(0.2, 0), (0.8, 1), (0.6, 1), (0.3, 0)], "score double, label int"
    )
    state = str(tmp_path / "state")
    per_score_counts(docs).write.parquet(f"{state}/ingest_batch=0")
    with pytest.raises(SystemExit, match="--group-by cannot apply"):
        main(["evaluate", state, "--state", "--group-by", "lang"], spark=spark)
    with pytest.raises(SystemExit, match="--score-col/--label-col"):
        main(["evaluate", state, "--state", "--score-col", "s"], spark=spark)
    # the plain state read still works
    assert main(["evaluate", state, "--state"], spark=spark) == 0


def test_pack_ordinal_decodes_encoding(spark):
    """r13 review finding companion: the CLI chunk count now decodes
    pack_id through packing.pack_ordinal instead of re-implementing the
    shift constant."""
    from pyspark.sql import functions as F

    from mwas_rfam_spark.operators.packing import (
        PACK_BUCKET_SHIFT,
        pack_documents,
        pack_ordinal,
    )

    docs = spark.createDataFrame(
        [(i, "w " * 40) for i in range(20)], "doc_id long, text string"
    )
    packed = pack_documents(docs, max_tokens_per_pack=100, n_buckets=4)
    bad = packed.where(
        pack_ordinal() != F.col("pack_id") - F.col("bucket") * F.lit(PACK_BUCKET_SHIFT)
    ).count()
    assert bad == 0
    ords = [r[0] for r in packed.select(pack_ordinal().alias("o")).collect()]
    assert min(ords) >= 1


def test_monitor_cli_golden_table(spark, tmp_path, capsys):
    """r13 (the r11 stretch): `monitor` renders one eval-state dir as
    the full live table — global + per-slice AUC, ECE, and
    precision/recall/F1 at each threshold — off one authoritative
    state read, zero scored-row rescans. Golden-pinned; values also
    cross-checked against the eval_state readers the table fronts."""
    from pyspark.sql import functions as F

    from mwas_rfam_spark.__main__ import monitor_main
    from mwas_rfam_spark.operators.evaluation import grouped_per_score_counts
    from mwas_rfam_spark.streaming.requests import (
        eval_state_calibration,
        eval_state_grouped_auc,
    )

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "ko", 0.1 * (i % 10), (i % 4) // 2)
         for i in range(80)],
        "doc_id long, lang string, score double, label int",
    )
    gstate = str(tmp_path / "gstate")
    for b in range(2):
        grouped_per_score_counts(
            docs.where(F.col("doc_id") % 2 == b), ["lang"]
        ).write.parquet(f"{gstate}/ingest_batch={b}")

    rep = str(tmp_path / "rep")
    assert monitor_main([gstate, "--output", rep], spark) == 0
    got = capsys.readouterr().out.splitlines()
    golden = [
        "slice    n_pos  n_neg  n_null  auc     ece     p@0.5   r@0.5   f1@0.5",
        "ALL      40     40     0       0.5000  0.2500  0.5000  0.5000  0.5000",
        "lang=en  20     20     0       0.5000  0.2400  0.5000  0.6000  0.5455",
        "lang=ko  20     20     0       0.5000  0.2600  0.5000  0.4000  0.4444",
    ]
    assert got == golden

    # the table IS the readers' numbers (rounded for display)
    sl = {r["lang"]: r for r in eval_state_grouped_auc(spark, gstate).collect()}
    assert f"{sl['en']['auc']:.4f}" == "0.5000"
    cal = eval_state_calibration(spark, gstate)
    assert cal.where(F.col("lang") == "en").count() > 0

    # --output parquet mirrors the table relation
    out = {r["slice"]: r for r in spark.read.parquet(rep).collect()}
    assert out["ALL"]["n_pos"] == 40 and out["lang=ko"]["r@0.5"] == 0.4
    assert abs(out["lang=en"]["f1@0.5"] - 6.0 / 11.0) < 1e-12


def test_monitor_cli_ungrouped_and_all_invalid_slice(spark, tmp_path, capsys):
    """monitor on an ungrouped dir renders just the ALL row; a slice
    whose every score is NaN still shows up (auc/threshold cells as
    dashes) rather than vanishing — monitoring must surface it."""
    from pyspark.sql import functions as F

    from mwas_rfam_spark.__main__ import monitor_main
    from mwas_rfam_spark.operators.evaluation import (
        grouped_per_score_counts,
        per_score_counts,
    )

    docs = spark.createDataFrame(
        [(i, 0.1 * (i % 10), i % 2) for i in range(40)],
        "doc_id long, score double, label int",
    )
    ustate = str(tmp_path / "ustate")
    per_score_counts(docs).write.parquet(f"{ustate}/ingest_batch=0")
    assert monitor_main([ustate], spark) == 0
    out = capsys.readouterr().out.splitlines()
    assert len(out) == 2 and out[1].startswith("ALL")

    bad = docs.withColumn(
        "score",
        F.when(F.col("doc_id") % 2 == 0, float("nan")).otherwise(F.col("score")),
    ).withColumn("lang", F.when(F.col("doc_id") % 2 == 0, "xx").otherwise("en"))
    gstate = str(tmp_path / "g2")
    grouped_per_score_counts(bad, ["lang"]).write.parquet(
        f"{gstate}/ingest_batch=0"
    )
    assert monitor_main([gstate], spark) == 0
    lines = capsys.readouterr().out.splitlines()
    xx = next(line for line in lines if line.startswith("lang=xx"))
    cells = xx.split()
    # n_pos n_neg 0, n_null 20, every metric a dash
    assert cells[1:4] == ["0", "0", "20"]
    assert cells[4:] == ["-"] * 5


def test_monitor_cli_over_real_stream_state(spark, tmp_path, capsys):
    """End-to-end live-monitoring story: a REAL Structured Streaming
    writer (streaming_eval_counts with group_cols, file source, three
    micro-batches) builds the state; `monitor` renders it; the numbers
    equal the row-level evaluation over everything streamed."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from mwas_rfam_spark.__main__ import monitor_main
    from mwas_rfam_spark.operators.evaluation import binary_auc, grouped_auc
    from mwas_rfam_spark.streaming.requests import streaming_eval_counts

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "ko", 0.1 * (i % 10), (i % 4) // 2)
         for i in range(90)],
        "doc_id long, lang string, score double, label int",
    ).cache()
    src = tmp_path / "src"
    os.makedirs(src, exist_ok=True)
    for i in range(3):
        stage = tmp_path / f"stage{i}"
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(stage))
        shutil.copy(glob.glob(str(stage / "*.parquet"))[0],
                    str(src / f"b{i}.parquet"))

    state = str(tmp_path / "state")
    q = (
        streaming_eval_counts(
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src)),
            state,
            group_cols=["lang"],
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert monitor_main([state], spark) == 0
    lines = capsys.readouterr().out.splitlines()
    by_slice = {line.split()[0]: line.split() for line in lines[1:]}
    want_all = binary_auc(docs).collect()[0]
    assert by_slice["ALL"][4] == f"{want_all['auc']:.4f}"
    for r in grouped_auc(docs, ["lang"]).collect():
        assert by_slice[f"lang={r['lang']}"][4] == f"{r['auc']:.4f}"
