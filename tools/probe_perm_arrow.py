"""Probe: cogrouped applyInArrow vs applyInPandas for the mwas
permutation kernel (r13 VERDICT item #1; guide §4 Python boundary).

Runs the full mwas_full pipeline (the bench's own _mwas_full, forced
with the noop sink) ALTERNATING between the two kernel paths
(SPARK_GRAFT_PERM_ARROW env, read per run_tests call), and reports per
run: wall seconds, the permutation wave's in-kernel seconds (sum of
the per-test runtime_seconds telemetry — everything else the wave
spends is boundary/conversion/scheduling overhead), and the perm row
count. Also asserts the two variants' outputs are IDENTICAL on every
value column (runtime_seconds excluded — it is a wall-clock
measurement, nondeterministic by nature on both paths).

Usage: python tools/probe_perm_arrow.py [sf_dir] [rounds]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod
from mwas_rfam_spark.session import get_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import functions as F

    spark = get_spark(app_name="probe-perm-arrow")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    benchmod._warmup(spark, sf_dir)

    from mwas_rfam_spark.operators.mwas import release_mwas_persists

    snapshots: dict[str, list] = {}

    def run(variant: str, snapshot: bool):
        os.environ["SPARK_GRAFT_PERM_ARROW"] = variant
        t0 = time.time()
        out = benchmod._mwas_full(spark, sf_dir)
        benchmod._force(out)
        wall = time.time() - t0
        perm = out.filter(F.col("status").startswith("permutation"))
        st = perm.agg(
            F.sum("runtime_seconds").alias("k"), F.count("*").alias("n")
        ).first()
        if snapshot and variant not in snapshots:
            rows = (
                out.drop("runtime_seconds")
                .orderBy("bioproject", "group", "metadata_field", "metadata_value")
                .collect()
            )
            snapshots[variant] = [tuple(r) for r in rows]
        release_mwas_persists()
        spark.catalog.clearCache()
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        return {
            "variant": "arrow" if variant == "1" else "pandas",
            "wall_sec": round(wall, 3),
            "kernel_sec": round(float(st["k"] or 0.0), 3),
            "perm_rows": int(st["n"]),
        }

    canary0 = benchmod._canary(sf_dir)
    results = []
    order = ["0", "1"] * rounds  # pandas / arrow alternating
    for i, v in enumerate(order):
        results.append(run(v, snapshot=True))
        print(json.dumps(results[-1]), flush=True)
    canary1 = benchmod._canary(sf_dir)

    identical = snapshots.get("0") == snapshots.get("1")
    print(
        json.dumps(
            {
                "results": results,
                "outputs_identical_ex_runtime": identical,
                "canary_start": {
                    k: canary0.get(k) for k in ("cpu_matmul_sec", "cpu_hash_sec")
                },
                "canary_end": {
                    k: canary1.get(k) for k in ("cpu_matmul_sec", "cpu_hash_sec")
                },
            }
        )
    )
    if not identical:
        sys.exit(1)


if __name__ == "__main__":
    main()
