"""mwas_full bench forensics (VERDICT r2 task #1).

The driver's r02 bench recorded mwas_full at 21.8 s min-of-2 vs r01's
10.3 s with no code change that explains it. This script separates the
candidate causes in ONE session:

  phase A: warmup, then time mwas_full 3x        (fresh-JVM placement)
  phase B: run the 21 other headline queries once (ages heap/pools the
           way bench.py does before it times mwas_full)
  phase C: time mwas_full 3x again               (aged-JVM placement)

Per run it records wall seconds, the driver-JVM GC time delta (local
mode: executors live in the driver JVM, so JMX GC beans see all of it),
heap used before/after, and the per-stage executorRunTime/CpuTime sums
from the status REST API (UI forced on). If C >> A the drift is
heap/pool aging inside the session and bench.py must report placement;
if A ~ C ~ 10-12 s the driver-run number was box noise.

Usage: python tools/bench_forensics.py [sf_dir]   (default sf0.1)
Prints one JSON line: {"fresh": [...], "aged": [...], "suite_sec": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import HEADLINE, _force, _mwas_full, _warmup
from mwas_rfam_spark.session import get_spark


def _gc_ms(spark) -> int:
    beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def _heap_mb(spark) -> int:
    mem = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getMemoryMXBean()
    return int(mem.getHeapMemoryUsage().getUsed() / 1e6)


def _stages(spark) -> dict[int, dict]:
    """Completed-stage metrics from the status REST API, keyed by stageId."""
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


def _run_once(spark, sf_dir, label: str) -> dict:
    from mwas_rfam_spark.operators.mwas import release_mwas_persists

    before_stages = set(_stages(spark))
    gc0, heap0 = _gc_ms(spark), _heap_mb(spark)
    t0 = time.time()
    _force(_mwas_full(spark, sf_dir))
    wall = time.time() - t0
    gc1, heap1 = _gc_ms(spark), _heap_mb(spark)
    release_mwas_persists()
    spark.catalog.clearCache()
    after = _stages(spark)
    new = [s for sid, s in after.items() if sid not in before_stages]
    run_ms = sum(s.get("executorRunTime", 0) for s in new)
    cpu_ms = sum(s.get("executorCpuTime", 0) for s in new) / 1e6  # ns -> ms
    # the 5 slowest new stages, for naming a regressing stage
    slowest = sorted(new, key=lambda s: -s.get("executorRunTime", 0))[:5]
    out = {
        "label": label,
        "wall_sec": round(wall, 2),
        "gc_delta_ms": gc1 - gc0,
        "heap_before_mb": heap0,
        "heap_after_mb": heap1,
        "n_stages": len(new),
        "executor_run_ms": run_ms,
        "executor_cpu_ms": int(cpu_ms),
        "slowest_stages": [
            {
                "id": s["stageId"],
                "name": s.get("name", "")[:60],
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
        app_name="mwas-bench-forensics", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _warmup(spark, sf_dir)

    fresh = [_run_once(spark, sf_dir, f"fresh_{i}") for i in range(3)]

    qs = entrymod.bench_queries()
    t0 = time.time()
    for name in HEADLINE:
        _force(qs[name](spark, sf_dir))
        spark.catalog.clearCache()
    suite = time.time() - t0
    print(json.dumps({"suite_sec": round(suite, 1)}), file=sys.stderr)

    aged = [_run_once(spark, sf_dir, f"aged_{i}") for i in range(3)]

    print(json.dumps({"fresh": fresh, "aged": aged, "suite_sec": round(suite, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
