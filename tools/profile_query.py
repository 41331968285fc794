"""Profile one bench query: run it in a fresh session with the Spark UI
enabled, then read the REST API for per-stage wall/metrics so the time
goes to a named operator, not a guess.

Usage: python tools/profile_query.py <name> [sf_dir] [reps]

Prints per-stage: stage id, wall seconds (completion-submission), task
time sum, shuffle read/write bytes, input bytes, and the stage name
(first line, which names the terminal operator + job description).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod
import __spark_entry__ as entrymod
from mwas_rfam_spark.session import get_spark


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark(app_name=f"profile-{name}", extra_conf={"spark.ui.enabled": "true"})
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    benchmod._warmup(spark, sf_dir)
    qs = entrymod.bench_queries()

    def run():
        if name == "mwas_full":
            df = benchmod._mwas_full(spark, sf_dir)
        else:
            df = qs[name](spark, sf_dir)
        benchmod._force(df)

    walls = []
    first_job = 0
    tracker = spark.sparkContext.statusTracker()
    for i in range(reps):
        ids = tracker.getJobIdsForGroup(None)
        first_job = (max(ids) + 1) if ids else 0
        spark.sparkContext.setJobDescription(f"{name} rep{i}")
        t0 = time.time()
        run()
        walls.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    print(f"walls: {walls}")

    base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':',1)[1]}"
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs") as r:
        jobs = json.load(r)
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages?status=complete") as r:
        stages = json.load(r)
    # restrict to the LAST rep's jobs
    last_jobs = [j for j in jobs if (j.get("description") or "").endswith(f"rep{reps-1}")]
    stage_ids = set()
    for j in last_jobs:
        stage_ids.update(j.get("stageIds", []))
    rows = []
    for s in stages:
        if s["stageId"] not in stage_ids:
            continue
        try:
            sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
            comp = s.get("completionTime")
            from datetime import datetime
            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            wall = (datetime.strptime(comp.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                    - datetime.strptime(sub.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")).total_seconds()
        except Exception:
            wall = -1
        rows.append((
            s["stageId"], round(wall, 3), round(s.get("executorRunTime", 0) / 1000, 2),
            s.get("numTasks", 0),
            s.get("inputBytes", 0), s.get("shuffleReadBytes", 0), s.get("shuffleWriteBytes", 0),
            (s.get("name") or "").split("\n")[0][:80],
        ))
    rows.sort(key=lambda r: -r[1])
    print(f"{'stg':>4s} {'wall_s':>7s} {'task_s':>7s} {'nT':>4s} {'input':>10s} {'shR':>10s} {'shW':>10s}  name")
    for r in rows:
        print(f"{r[0]:4d} {r[1]:7.3f} {r[2]:7.2f} {r[3]:4d} {r[4]:10d} {r[5]:10d} {r[6]:10d}  {r[7]}")
    total_wall = sum(r[1] for r in rows if r[1] > 0)
    print(f"sum stage walls: {round(total_wall,2)} vs query wall {walls[-1]} (gap = driver/planning/gaps)")
    spark.stop()


if __name__ == "__main__":
    main()
