"""Probe: do localCheckpoint blocks accumulate across bench queries inside
one session, and does that degrade later runs?

bench.py clears the SQL cache between timed runs (`spark.catalog.clearCache()`)
but localCheckpoint blocks are RDD-level storage: they are freed only when the
JVM-side RDD object is garbage-collected and the ContextCleaner processes it.
In a tight bench loop the driver JVM may not run an old-gen GC for minutes, so
checkpoint blocks from EVERY previous query sit in the unified memory region,
forcing eviction/spill work on later queries.

Usage: python tools/checkpoint_probe.py [n_runs] [--gc]
  --gc   after each run: python gc.collect() + JVM System.gc() (drops the
         py4j refs, then lets ContextCleaner reap the checkpoint RDDs)

Prints one line per run: wall seconds, persisted-RDD count, storage bytes.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from mwas_rfam_spark.session import get_spark


def storage(sc):
    infos = sc._jsc.sc().getRDDStorageInfo()
    return len(infos), sum(i.memSize() + i.diskSize() for i in infos)


def main():
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 4
    use_gc = "--gc" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark(app_name="checkpoint-probe")
    sc = spark.sparkContext
    qs = entrymod.bench_queries()
    fn = qs["dedup_pipeline"]

    # identical warmup to bench.py's python-worker ramp
    from pyspark.sql import functions as F

    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    _identity = F.pandas_udf(lambda v: v, "double")
    cpus = sc.defaultParallelism
    spark.range(cpus * 100).repartition(cpus * 2).select(
        F.sum(_identity(F.col("id").cast("double")))
    ).collect()

    print(f"mode={'gc' if use_gc else 'plain'} sf={sf_dir}")
    for i in range(n_runs):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        if use_gc:
            gc.collect()
            sc._jvm.System.gc()
            time.sleep(1)  # let ContextCleaner drain its queue
        n, b = storage(sc)
        print(f"run {i}: {dt:6.2f}s  persisted_rdds={n:3d}  storage={b/1e6:8.1f} MB", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
