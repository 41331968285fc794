"""Forensics for the one r5->r6 common-subset bench mover (VERDICT r6
task #2): text_bigram_quality 1.08 -> 1.51 s with per-run spread
[2.49, 1.51, 2.54] on UNTOUCHED code (the r6 text.py diff only appends
the unicode functions after the bigram path).

Same methodology as tools/bench_forensics4.py: fresh-JVM min-of-3 right
after warmup, then min-of-3 again after the full headline suite has aged
the JVM, with per-run GC delta / heap / slowest stages. The r4/r5
forensics traced every such mover to measurement noise under aged-JVM
min-of-N; this pins whether the bigram row is the same story.

Usage: python tools/bench_forensics7.py [sf_dir]     (default sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import HEADLINE, _force, _warmup, testdata_fingerprint
from mwas_rfam_spark.session import get_spark
from tools.bench_forensics4 import _run_once

MOVERS = ["text_bigram_quality", "text_lang_quality"]  # neighbor = control


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="mwas-bench-forensics7", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _warmup(spark, sf_dir)
    qs = entrymod.bench_queries()

    result: dict = {"testdata_fingerprint": testdata_fingerprint(sf_dir)}
    fresh = {
        name: [_run_once(spark, sf_dir, name, qs[name], f"fresh_{i}") for i in range(3)]
        for name in MOVERS
    }

    t0 = time.time()
    for name in HEADLINE:
        _force(qs[name](spark, sf_dir))
        spark.catalog.clearCache()
    suite = time.time() - t0

    aged = {
        name: [_run_once(spark, sf_dir, name, qs[name], f"aged_{i}") for i in range(3)]
        for name in MOVERS
    }
    for name in MOVERS:
        result[name] = {
            "fresh": fresh[name],
            "aged": aged[name],
            "fresh_min": min(r["wall_sec"] for r in fresh[name]),
            "aged_min": min(r["wall_sec"] for r in aged[name]),
        }
    result["suite_sec"] = round(suite, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
