"""Forensics for the four unexplained r3→r4 bench movers (VERDICT r4
task #1): dedup_pipeline +26%, dedup_minhash_lsh +31%, condense_readable
+37%, j9_asof_join +32%.

Same methodology as tools/bench_forensics.py (the r2 run that traced the
mwas_full swing): min-of-3 at BOTH placements — fresh (right after
warmup) and aged (after the full headline suite has aged the JVM) — plus
per-run GC delta, heap, and the status-API stage breakdown naming the
slowest stages. One extra check specific to this episode: the testdata
fingerprint, because the driver REGENERATED the testdata between the r3
and r4 bench runs (BENCH_r03 has no fingerprint field; BENCH_r04 records
abb34c88... with comparable_to_prev_round=null), so "corpus" is a live
hypothesis the r3→r4 delta cannot rule out by itself.

Usage: python tools/bench_forensics4.py [sf_dir]      (default sf0.1)
Prints one JSON object: per-query {fresh: [...], aged: [...]} plus the
fingerprint and suite time.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import HEADLINE, _force, _warmup, testdata_fingerprint
from mwas_rfam_spark.session import get_spark

MOVERS = ["dedup_pipeline", "dedup_minhash_lsh", "condense_readable", "j9_asof_join"]


def _gc_ms(spark) -> int:
    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def _heap_mb(spark) -> int:
    mem = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getMemoryMXBean()
    return int(mem.getHeapMemoryUsage().getUsed() / 1e6)


def _stages(spark) -> dict[int, dict]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            data = json.load(r)
    except Exception:
        return {}
    return {s["stageId"]: s for s in data}


def _run_once(spark, sf_dir, qname, fn, label: str) -> dict:
    before = set(_stages(spark))
    gc0, heap0 = _gc_ms(spark), _heap_mb(spark)
    t0 = time.time()
    _force(fn(spark, sf_dir))
    wall = time.time() - t0
    gc1, heap1 = _gc_ms(spark), _heap_mb(spark)
    spark.catalog.clearCache()
    after = _stages(spark)
    new = [s for sid, s in after.items() if sid not in before]
    slowest = sorted(new, key=lambda s: -s.get("executorRunTime", 0))[:4]
    out = {
        "q": qname,
        "label": label,
        "wall_sec": round(wall, 3),
        "gc_delta_ms": gc1 - gc0,
        "heap_before_mb": heap0,
        "heap_after_mb": heap1,
        "n_stages": len(new),
        "executor_run_ms": sum(s.get("executorRunTime", 0) for s in new),
        "slowest_stages": [
            {
                "id": s["stageId"],
                "name": s.get("name", "")[:50],
                "run_ms": s.get("executorRunTime", 0),
                "tasks": s.get("numTasks", 0),
            }
            for s in slowest
        ],
    }
    print(json.dumps(out), file=sys.stderr)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="mwas-bench-forensics4", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _warmup(spark, sf_dir)
    qs = entrymod.bench_queries()

    result: dict = {"testdata_fingerprint": testdata_fingerprint(sf_dir)}
    fresh: dict[str, list] = {}
    for name in MOVERS:
        fresh[name] = [
            _run_once(spark, sf_dir, name, qs[name], f"fresh_{i}") for i in range(3)
        ]

    t0 = time.time()
    for name in HEADLINE:
        _force(qs[name](spark, sf_dir))
        spark.catalog.clearCache()
    suite = time.time() - t0

    aged: dict[str, list] = {}
    for name in MOVERS:
        aged[name] = [
            _run_once(spark, sf_dir, name, qs[name], f"aged_{i}") for i in range(3)
        ]

    for name in MOVERS:
        result[name] = {
            "fresh": fresh[name],
            "aged": aged[name],
            "fresh_min": min(r["wall_sec"] for r in fresh[name]),
            "aged_min": min(r["wall_sec"] for r in aged[name]),
        }
    result["suite_sec"] = round(suite, 1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
