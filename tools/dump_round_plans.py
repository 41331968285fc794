"""Dump `.explain("formatted")` for every bench headline query into
plans/<tag>/<query>_<suffix>.txt (the optimization round's before/after
evidence files).

Usage: python tools/dump_round_plans.py <tag> <suffix> [sf_dir] [name ...]
e.g.   python tools/dump_round_plans.py r13 before /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod
import __spark_entry__ as entrymod
from mwas_rfam_spark.session import get_spark


def main():
    tag = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark(app_name="dump-round-plans")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    qs = entrymod.bench_queries()
    targets = names or [n for n in benchmod.HEADLINE] + ["mwas_full"]
    for name in targets:
        try:
            if name == "mwas_full":
                df = benchmod._mwas_full(spark, sf_dir)
            else:
                df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - record the failure in place
            plan = f"ERROR dumping plan: {type(e).__name__}: {e}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
