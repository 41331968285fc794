"""Run an arbitrary list of headline queries through bench.py's own
--chunk protocol (fresh subprocess JVM, warmup, prerun + min-of-3) and
print the timings plus a machine-speed canary stamp on both sides.

Usage: python tools/bench_chunk.py <name> [name ...]
       SPARK_GRAFT_SF_DIR overrides the data dir (default sf0.1).

This is the round's before/after measurement harness: same protocol as
the driver's bench, restricted to the queries under study, with the
canary denominator to adjudicate machine drift.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as benchmod


def main():
    names = sys.argv[1:]
    assert names, "usage: bench_chunk.py <query> [query ...]"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    canary0 = benchmod._canary(sf_dir)
    with tempfile.TemporaryDirectory() as td:
        spec = {"sf_dir": sf_dir, "names": names, "out": os.path.join(td, "o.json")}
        spec_path = os.path.join(td, "spec.json")
        with open(spec_path, "w") as f:
            json.dump(spec, f)
        proc = subprocess.run(
            [sys.executable, os.path.join(here, "bench.py"), "--chunk", spec_path],
            cwd=here, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, timeout=1800,
        )
        if proc.returncode != 0 or not os.path.exists(spec["out"]):
            print(proc.stdout.decode(errors="replace")[-3000:])
            sys.exit(1)
        with open(spec["out"]) as f:
            res = json.load(f)
    canary1 = benchmod._canary(sf_dir)
    print(json.dumps({
        "timings": res["timings"],
        "runs": res["runs"],
        "canary_start": {k: canary0.get(k) for k in ("cpu_matmul_sec", "cpu_hash_sec")},
        "canary_end": {k: canary1.get(k) for k in ("cpu_matmul_sec", "cpu_hash_sec")},
        "loadavg": benchmod._loadavg(),
    }))


if __name__ == "__main__":
    main()
