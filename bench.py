"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line (last):
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "protocol": "...", "sf": ...}

Each query is forced end-to-end with the noop sink (full computation, no
driver-side collect overhead), and measured as a FRESH-JVM min-of-3:
the headline list runs in fixed chunks of CHUNK_SIZE queries, each
chunk in its own subprocess SparkSession (see the protocol note at
CHUNK_SIZE) — the r5-r7 aged-session drift cannot reach any number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from mwas_rfam_spark.config import MwasConfig
from mwas_rfam_spark.session import get_spark

HEADLINE = [
    "mwas_cohort_welch",
    "condense_sets",
    "j1_outer_join_agg",
    "a4_two_level_rollup",
    "a7_signature_dedup",
    "w5_topk_per_group",
    "t1_welch_from_stats",
    "condense_readable",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_pipeline",
    "dedup_minhash_lsh",
    "dedup_minhash_md5",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "multimodal_decode",
    "text_lang_quality",
    "text_winnowing",
    "text_bigram_quality",
    "text_decontam",
    "shuffle_shard",
    "line_dedup",
    "semantic_dedup",
    "curation_pipeline",
    "j9_asof_join",
    "j10_sessionize",
    "events_quantiles",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "pq_adc_topk",
    "hybrid_rrf",
    "dsir_select",
    "quality_linear",
    "cluster_sample",
    "dup_spans",
    "bm25_topk",
    "incremental_embedding",
    "fuzzy_editdist",
    "fuzzy_editdist_long",
    "embed_pca_reduce",
    "model_eval",
    "cms_freq",
    "opq_encode",
    "sq8_topk",
    "ivfpq_indexed",
    "source_mix",
    "dedup_approx_eval",
    "image_dedup",
    "semantic_decontam",
    "embed_drift",
    "ann_knn_join",
    "ivfpq_knn_join",
    "drift_report",
    "bpe_tokenize",
    "cdc_dedup",
    "dedup_containment",
    "events_hourly",
    # r9: the per-slice fairness query (grouped two-level prefix sum) —
    # appended at the END per the chunk-composition rule above
    "grouped_auc",
    # r11: the two newest registered evaluation surfaces (rotation IN)
    # — appended at the END per the chunk-composition rule above
    "grouped_calibration",
    "eval_state_auc",
    # r13: the per-slice state readers (rotations IN) — appended at the
    # END per the chunk-composition rule above; eval_state_calibration
    # (registered r12, never benched) rides along so the whole
    # four-reader family has a bench series
    "eval_state_grouped_auc",
    "eval_state_threshold_report",
    "eval_state_calibration",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def testdata_fingerprint(sf_dir: str) -> str:
    """Footer-level fingerprint of the benchmark inputs: md5 over each
    table's (name, row count, serialized schema, per-row-group sizes).
    A driver-side testdata regeneration changes it even when row counts
    survive (the 2026-08-13 regeneration changed the ts physical type
    and the documents corpus character at identical shapes), so
    cross-round BENCH deltas are mechanically attributable — same
    fingerprint = same inputs, different = corpus noise is in play."""
    import hashlib

    import pyarrow.parquet as pq

    h = hashlib.md5()
    for t in TABLES:
        md = pq.ParquetFile(f"{sf_dir}/{t}.parquet").metadata
        h.update(t.encode())
        h.update(str(md.num_rows).encode())
        h.update(md.schema.to_arrow_schema().serialize().to_pybytes())
        for rg in range(md.num_row_groups):
            h.update(str(md.row_group(rg).total_byte_size).encode())
    return h.hexdigest()


def _prev_bench_meta() -> tuple[str, str | None] | None:
    """(testdata_fingerprint, protocol) recorded in the newest
    BENCH_r*.json beside this script, if any round has recorded one.
    Protocol is None for pre-r8 artifacts that predate the field —
    those were the aged-single-JVM mix protocol, never equal to any
    fresh-chunk protocol string, so None correctly compares unequal."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    matched = [
        (int(m.group(1)), p)
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    benches = [p for _, p in sorted(matched)]
    for path in reversed(benches):
        try:
            with open(path) as f:
                blob = f.read()
        except OSError:
            continue
        # the driver's BENCH_r*.json wraps our output line inside a
        # "tail" JSON string, so the quotes around the key may arrive
        # backslash-escaped — match both forms
        m = re.search(
            r'\\?"testdata_fingerprint\\?":\s*\\?"([0-9a-f]{32})\\?"', blob
        )
        if m:
            pm = re.search(r'\\?"protocol\\?":\s*\\?"([a-z0-9_]+)\\?"', blob)
            return m.group(1), (pm.group(1) if pm else None)
    return None


def _warmup(spark, sf_dir):
    """Untimed: pull parquet footers/schemas into cache and warm the JVM
    (codegen, Arrow) and the Python worker pool so timings measure the
    engine, not first-query startup (a cold worker pays ~200ms of
    pandas/numpy import; 32 workers booting inside a timed stage is ~7s)."""
    from pyspark.sql import functions as F

    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    _identity = F.pandas_udf(lambda v: v, "double")
    cpus = spark.sparkContext.defaultParallelism
    spark.range(cpus * 100).repartition(cpus * 2).select(
        F.sum(_identity(F.col("id").cast("double")))
    ).collect()


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _mwas_full(spark, sf_dir):
    """Complete MWAS incl. seeded permutation tests (the reference's
    dominant production workload)."""
    from mwas_rfam_spark.operators.condense import condense_metadata
    from mwas_rfam_spark.operators.mwas import run_mwas
    from mwas_rfam_spark.plans.testdata_mwas import (
        mwas_catalog_from_orders,
        mwas_input_from_events,
        mwas_metadata_long_from_customer,
    )

    cfg = MwasConfig(permutation_resamples=10_000)
    sets_df, ref_df = condense_metadata(mwas_metadata_long_from_customer(spark, sf_dir))
    return run_mwas(
        mwas_input_from_events(spark, sf_dir),
        mwas_catalog_from_orders(spark, sf_dir),
        sets_df,
        ref_df,
        cfg,
    )


# Fresh-JVM chunk protocol (r8): three consecutive rounds of forensics
# (SCALE.md r5/r6/r7) concluded the verdict's "regression" lists were
# dominated by AGED-SESSION measurement drift — queries late in a
# 58-query single-JVM run land 20-60% above their fresh-JVM minima with
# zero plan change, and fresh-JVM isolation returns every flagged mover
# to baseline. The protocol, not the operators, was the bug. Fix: the
# headline list runs in fixed-order chunks of CHUNK_SIZE, EACH IN ITS
# OWN SUBPROCESS JVM with its own warmup — no query ever executes in a
# JVM older than ~8 queries, so every number is a fresh-JVM min-of-3
# and round-over-round deltas compare like with like. Chunk membership
# is a pure function of HEADLINE order; new queries append to the END
# of HEADLINE so only the final chunk's composition ever changes.
CHUNK_SIZE = 8

# r9 protocol amendment (VERDICT r8 "What's wrong #3"): the r8 fresh-chunk
# numbers landed ~+20% above both the r7 aged-mins AND the r6 one-off
# fresh-JVM per-query minima — the chunk's generic warmup does not amortize
# PER-QUERY codegen/JIT, so each query's first timed run paid its own
# compilation debt and min-of-3 didn't fully clear it. Fix: one UNTIMED
# pre-run of each query inside its chunk before the timed min-of-3, so the
# timed minimum is post-codegen. The A/B on chunk 1 (the dedup chunk) is
# recorded in SCALE.md §"r9 warm-debt forensics". Env knob
# SPARK_GRAFT_BENCH_PRERUN=0 reproduces the r8 protocol for forensics.
PRERUN = os.environ.get("SPARK_GRAFT_BENCH_PRERUN", "1") != "0"


def _timed(spark, raw_runs, name, fn, n=3, prerun=None) -> float:
    """min of n runs: single-shot numbers on this box vary up to 4×
    (GC / scheduler / co-tenant noise); the minimum is the steady-state
    cost. Caches are cleared between runs so each timing is cold-plan.
    Every raw run is recorded in the output's `runs` field so a drift
    can be diagnosed from the artifact instead of re-measured.
    min-of-3, not 2: the r5 forensics on the four r3→r4 'movers'
    (SCALE.md) traced their +25-40% swings entirely to first-run
    codegen/JIT/GC debt that one retry doesn't reliably clear."""
    import gc

    runs = []
    # PRERUN: one untimed pre-run pays this query's own codegen/JIT debt
    # so the timed min below is post-codegen. It is still recorded in
    # raw_runs (always runs[0] of the n+1) for forensics, but excluded
    # from the reported min. Callers whose metric IS first-run behavior
    # (mwas_full_first) override with prerun=False.
    if prerun is None:
        prerun = PRERUN
    total_runs = (n + 1) if prerun else n
    for _ in range(total_runs):
        t0 = time.time()
        _force(fn())
        runs.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
        # untimed GC between runs, BOTH sides of the gateway:
        # localCheckpoint blocks from prior queries are only freed when
        # their RDD handles are garbage-collected, and the py4j proxies
        # holding those handles die on the PYTHON collector's schedule —
        # System.gc() alone can't free a block whose proxy still pins it
        # (measured on dedup_ngram_jaccard: [11.7, 4.0, 3.3, 3.1]
        # back-to-back without GC vs [2.8, 3.1, 3.2, 3.0] with)
        try:
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
    raw_runs.setdefault(name, []).extend(runs)
    return min(runs[1:] if prerun else runs)


def _cache_state(
    raw_runs: dict[str, list[float]],
    cached_gb_start: float | None,
    loadavg_start: list[float] | None = None,
    canary_start: dict | None = None,
    sf_dir: str | None = None,
    cached_gb_prewarmed: float | None = None,
) -> dict:
    """Compact cache-state summary for the parsed artifact (see
    `_meminfo_cached_gb`). first_over_min quantiles are computed from
    the pre-run (runs[0]) over the timed min for every PRERUN query —
    mwas_full/_first run prerun=False by design and are excluded. A
    median near 1.0 with Cached ≈ prior round's means per-query deltas
    are adjudicable; a high median or a cold start stamp means the
    round-over-round comparison is cache-confounded."""
    ratios = sorted(
        runs[0] / min(runs[1:])
        for name, runs in raw_runs.items()
        if PRERUN
        and name not in ("mwas_full", "mwas_full_first")
        and len(runs) >= 2
        and min(runs[1:]) > 0
    )
    state: dict = {
        "meminfo_cached_gb_start": cached_gb_start,
        # chunk-1's ACTUAL cache state: stamped after the canary's scan
        # leg deliberately prewarms sf_dir (see main's warm-start note)
        "meminfo_cached_gb_prewarmed": cached_gb_prewarmed,
        "meminfo_cached_gb_end": _meminfo_cached_gb(),
        # r13 amendment (see _loadavg/_canary): the page-cache stamps
        # above were falsified as SUFFICIENT by r12 — agreeing stamps
        # bracketed a +32% swing — so the artifact now also carries
        # machine-load and fixed-canary readings at both ends.
        "loadavg_start": loadavg_start,
        "loadavg_end": _loadavg(),
        "canary_start": canary_start,
        "canary_end": _canary(sf_dir) if sf_dir else None,
    }
    if ratios:
        state["first_over_min_median"] = round(ratios[len(ratios) // 2], 3)
        state["first_over_min_p90"] = round(
            ratios[min(len(ratios) - 1, int(0.9 * (len(ratios) - 1) + 0.5))], 3
        )
    return state


def _loadavg() -> list[float] | None:
    """/proc/loadavg 1/5/15-min runnable averages. r13 protocol
    amendment: r12's AGREEING cache stamps bracketed an 86.7→114.7 s
    whole-series swing on identical code, so page-cache state alone
    does not explain the drift — the remaining suspect is concurrent
    machine load, which this stamps directly."""
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except (OSError, ValueError):
        return None


def _canary(sf_dir: str) -> dict:
    """Fixed machine-speed canary, run before chunk 1 and after the
    last chunk (r13 protocol amendment, same motivation as _loadavg):
    two pinned micro-workloads whose cost NEVER changes when operators
    do, so future bench movers divide by a measured machine-speed
    denominator instead of arguing from agreeing-but-insufficient cache
    stamps. `cpu_matmul_sec` = 8 multiplies of a fixed seeded
    1024x1024 float64 pair (BLAS — degrades under core contention);
    `cpu_hash_sec` = sha256 over 64 MiB of fixed bytes (single-thread —
    degrades under scheduling pressure); `scan_sec` = byte-read of
    every *.parquet in sf_dir (page-cache/I-O state, complements the
    meminfo stamp)."""
    import glob
    import hashlib as _hashlib

    out: dict = {}
    try:
        import numpy as np

        rng = np.random.default_rng(0)
        a = rng.random((1024, 1024))
        b = rng.random((1024, 1024))
        t0 = time.perf_counter()
        for _ in range(8):
            a @ b
        out["cpu_matmul_sec"] = round(time.perf_counter() - t0, 4)
    except Exception:
        out["cpu_matmul_sec"] = None
    try:
        blob = b"\xa5" * (1 << 26)
        t0 = time.perf_counter()
        _hashlib.sha256(blob).hexdigest()
        out["cpu_hash_sec"] = round(time.perf_counter() - t0, 4)
    except Exception:
        out["cpu_hash_sec"] = None
    try:
        t0 = time.perf_counter()
        n = 0
        for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
            with open(p, "rb") as f:
                while True:
                    chunk = f.read(1 << 22)
                    if not chunk:
                        break
                    n += len(chunk)
        out["scan_sec"] = round(time.perf_counter() - t0, 4)
        out["scan_bytes"] = n
    except Exception:
        out["scan_sec"] = None
    return out


def _meminfo_cached_gb() -> float | None:
    """OS page-cache stamp (GiB of /proc/meminfo Cached). The r9→r10
    forensics closed the 'movers' question with data: all three r9
    movers reverted in r10 on byte-identical plans, and the WHOLE
    59-row series moved −16.6% on a round with zero benched-plan
    changes — the sf0.1 parquet either is or isn't OS-cache-resident
    when the round's first chunk starts, and that alone swings chunks
    ±17%. Stamping Cached into the artifact (r9 verdict task #1 /
    r10 carry-over #2) turns the next movers question into a data
    read: per-round deltas under ~20% are unadjudicable unless the
    two rounds' cache stamps agree."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("Cached:"):
                    return round(int(line.split()[1]) / (1024 * 1024), 2)
    except (OSError, ValueError, IndexError):
        pass
    return None


def _chunk_worker(spec_path: str) -> None:
    """Subprocess entry: fresh JVM, warmup, time the spec'd names,
    write {timings, runs} JSON, exit (the JVM dies with the process —
    that death IS the protocol)."""
    with open(spec_path) as f:
        spec = json.load(f)
    sf_dir = spec["sf_dir"]
    spark = get_spark(app_name="mwas-bench-chunk")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    _warmup(spark, sf_dir)
    qs = entrymod.bench_queries()
    raw_runs: dict[str, list[float]] = {}
    timings: dict[str, float] = {}
    for name in spec["names"]:
        if name == "mwas_full":
            # one fresh-JVM chunk, six runs: the first three report as
            # mwas_full_first, the last three as mwas_full — the two
            # fields keep their round-over-round series alive, but under
            # this protocol both placements are fresh (the r2-r7
            # placement question is closed by construction). BOTH calls
            # run prerun=False: mwas_full_first's metric IS first-run
            # behavior (a pre-run would silently redefine the series),
            # and by the second call the JVM has already executed the
            # identical query three times — its min is post-codegen
            # without burning two extra 10k-resample kernels.
            timings["mwas_full_first"] = _timed(
                spark, raw_runs, "mwas_full_first",
                lambda: _mwas_full(spark, sf_dir), n=3, prerun=False,
            )
            timings[name] = _timed(
                spark, raw_runs, name, lambda: _mwas_full(spark, sf_dir),
                n=3, prerun=False,
            )
        else:
            timings[name] = _timed(
                spark, raw_runs, name, lambda: qs[name](spark, sf_dir)
            )
    with open(spec["out"], "w") as f:
        json.dump({"timings": timings, "runs": raw_runs}, f)
    spark.stop()


def main():
    import subprocess
    import tempfile

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # scale factor from the DIRECTORY NAME only ("sf" + digits/dots at
    # the end) — the old rsplit("sf") grabbed everything after any "sf"
    # anywhere in the path (/data/sfo/run → "o/run"), emitting junk into
    # the artifact's `sf` field for non-sf-named dirs.
    import re

    _m = re.search(r"sf([0-9.]+)$", os.path.basename(os.path.normpath(sf_dir)))
    sf = _m.group(1) if _m else os.path.basename(os.path.normpath(sf_dir))

    chunks = [
        HEADLINE[i : i + CHUNK_SIZE] for i in range(0, len(HEADLINE), CHUNK_SIZE)
    ]
    chunks.append(["mwas_full"])  # the permutation kernel gets its own JVM

    timings: dict[str, float] = {}
    raw_runs: dict[str, list[float]] = {}
    mwas_full_first = None
    cached_gb_start = _meminfo_cached_gb()
    loadavg_start = _loadavg()
    # The canary's scan leg byte-reads every sf_dir parquet, so from the
    # moment it runs the benched tables are page-cache-resident. That is
    # now a DELIBERATE warm-start: the r10 forensics measured ±17%
    # whole-series swings tracking nothing but whether sf0.1 happened to
    # be cache-resident when chunk 1 started, and a warm start is the
    # one state every environment can reproduce (17.5 MB at sf0.1 always
    # fits; "whatever the previous workload left behind" never repeats).
    # The protocol string carries a `_warmstart` suffix so
    # comparable_to_prev_round goes False exactly once (r13 vs r12) —
    # claiming comparability across a conditions change is the r8
    # mistake this field exists to prevent — and
    # meminfo_cached_gb_prewarmed records the ACTUAL chunk-1 cache
    # state (the _start stamp describes the environment as found).
    canary_start = _canary(sf_dir)
    cached_gb_prewarmed = _meminfo_cached_gb()
    here = os.path.dirname(os.path.abspath(__file__))
    with tempfile.TemporaryDirectory() as td:
        for ci, names in enumerate(chunks):
            spec = {
                "sf_dir": sf_dir,
                "names": names,
                "out": os.path.join(td, f"chunk{ci}.json"),
            }
            spec_path = os.path.join(td, f"spec{ci}.json")
            with open(spec_path, "w") as f:
                json.dump(spec, f)
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--chunk", spec_path],
                    cwd=here,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                    # a wedged chunk JVM (shuffle deadlock, executor
                    # hang) must become a diagnosable failure, not an
                    # eternally-silent bench: the slowest healthy chunk
                    # (mwas_full's dedicated JVM) is ~30 s at sf0.1, so
                    # 30 min is pure-pathology headroom
                    timeout=1800,
                )
            except subprocess.TimeoutExpired as te:
                tail = (te.stdout or b"").decode(errors="replace")[-3000:]
                raise RuntimeError(
                    f"bench chunk {ci} ({names}) hung past 1800s:\n{tail}"
                ) from None
            if proc.returncode != 0 or not os.path.exists(spec["out"]):
                tail = proc.stdout.decode(errors="replace")[-3000:]
                raise RuntimeError(
                    f"bench chunk {ci} ({names}) failed "
                    f"(exit {proc.returncode}):\n{tail}"
                )
            with open(spec["out"]) as f:
                res = json.load(f)
            mwas_full_first = res["timings"].pop(
                "mwas_full_first", mwas_full_first
            )
            timings.update(res["timings"])
            raw_runs.update(res["runs"])

    # `value`/`queries` stay round-over-round comparable; every number
    # is now a fresh-JVM min-of-3 (see the CHUNK_SIZE note), and every
    # raw run rides alongside.
    total = round(sum(timings.values()), 3)
    fp = testdata_fingerprint(sf_dir)
    prev = _prev_bench_meta()
    protocol = (
        f"fresh_jvm_chunks_of_{CHUNK_SIZE}_prerun_min_of_3"
        if PRERUN
        else f"fresh_jvm_chunks_of_{CHUNK_SIZE}_min_of_3"
    ) + "_warmstart"  # r13: canary scan prewarms sf_dir before chunk 1
    headline = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # r8 protocol change: each number is measured in a subprocess
        # JVM running at most CHUNK_SIZE queries after warmup, so aged-
        # session drift (the r5-r7 phantom-mover source) cannot occur.
        # r9 amendment: untimed per-query pre-run inside the chunk (see
        # the PRERUN note) so the timed min is post-codegen.
        "protocol": protocol,
        "mwas_full_first": mwas_full_first,
        # the headline mwas_full rows run the kernel at the
        # reference's production resample count (BASELINE.md) —
        # recorded here so the artifact is baseline-comparable
        # without cross-referencing source
        "mwas_full_resamples": 10_000,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "testdata_fingerprint": fp,
        # Comparable only when BOTH the inputs (fingerprint) AND the
        # measurement protocol match the previous recorded round —
        # the r8 artifact claimed comparability across the protocol
        # rebase, which was wrong (judge r8 "What's wrong #2"). None =
        # no prior round recorded a fingerprint.
        "comparable_to_prev_round": (
            None if prev is None else (prev[0] == fp and prev[1] == protocol)
        ),
        # Cache-state marker (r10 carry-over task #2): meminfo Cached
        # at round start/end plus the distribution of per-query
        # first-run/timed-min ratios (the pre-run is always runs[0]
        # under PRERUN, so the ratio measures exactly the
        # codegen+page-cache debt the timed min excludes). Two rounds
        # are comparable at the per-query level only when these agree —
        # the r10 data showed ±17% whole-series swings on untouched
        # plans tracking nothing but this state.
        "cache_state": _cache_state(
            raw_runs, cached_gb_start, loadavg_start, canary_start, sf_dir,
            cached_gb_prewarmed,
        ),
    }
    # The raw-runs forensics blob made the single JSON line big enough
    # that the driver's stdout TAIL window truncated its head — BENCH
    # 'parsed' came back null (r4 judge item #2). Order of emission
    # matters: the blob goes to a FILE (and stdout first, where head
    # truncation is harmless), and the compact machine-parsable headline
    # is the LAST line printed so any tail window captures it whole.
    full = dict(headline, runs=raw_runs)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_runs_last.json"),
            "w",
        ) as fh:
            json.dump(full, fh)
    except OSError:
        pass
    print(json.dumps(full))
    print(json.dumps(headline))
    # no spark.stop() here: every SparkSession lives (and dies) inside a
    # --chunk subprocess; r8 left a legacy stop that NameError'd at exit


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--chunk":
        _chunk_worker(sys.argv[2])
    else:
        main()
