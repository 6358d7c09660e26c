"""Executor-process scaling protocol: N vs 4N cores as SEPARATE JVMs.

The thread protocol (scaling.py) scales local[N] threads inside ONE JVM.
That under-reports allocation-heavy whole-stage-codegen stages: all
threads share one heap, and a single G1 young generation serializes the
allocation path (measured: the same pipeline that gets 0.43 efficiency
from 4→16 threads in one JVM gets ~0.9 when the extra cores arrive as
extra JVMs).  A real cluster IS extra JVMs — one executor process per
few cores — so this protocol is the closer proxy for the north rule's
two-cluster-size criterion:

  level N : 1 process  × local[4]   (one 4-core executor)
  level 4N: 4 processes × local[4]  (four 4-core executors),
            each running the SAME job on the SAME input concurrently

efficiency = t(1 process) / max_i t(process i in the 4-way run)
(perfect isolation → 1.0; shared-resource contention pushes it down).

Usage: python BENCH/scaling_executors.py [sf_dir]
Writes results to stdout as one JSON line; BASELINE.md's addendum
records them.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, time, json
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_SCALE_REP"] = {rep!r}
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "8g"
os.environ["SPARK_GRAFT_LOCAL_DIR"] = "/dev/shm/sg_exec_%d" % os.getpid()
import bench
spark = bench.build_spark(4)
spark.sparkContext.setLogLevel("ERROR")
sf = {sf_dir!r}
fn = bench.queries()[{query!r}]
qdir = sf if {query!r}.startswith("kg_") else bench.ensure_scaled_tables(spark, sf)
best = None
for _ in range(2):
    t0 = time.time(); n = fn(spark, qdir).count(); dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({{"best": round(best, 3), "rows": n}}))
spark.stop()
"""


def run_worker(query: str, sf_dir: str, rep: str) -> subprocess.Popen:
    code = WORKER.format(repo=REPO, rep=rep, sf_dir=sf_dir, query=query)
    f = tempfile.NamedTemporaryFile("w", suffix=".py", delete=False)
    f.write(code)
    f.close()
    return subprocess.Popen([sys.executable, f.name],
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True)


def last_json(p: subprocess.Popen) -> dict:
    out, _ = p.communicate()
    lines = [l for l in out.strip().splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rep = os.environ.get("SPARK_GRAFT_SCALE_REP", "40")
    queries = os.environ.get("SPARK_GRAFT_EXEC_QUERIES",
                             "kg_repo_corpus,kg_tpch,dedup_minhash_lsh") \
        .split(",")
    results = {}
    for q in queries:
        p = run_worker(q, sf_dir, rep)
        single = last_json(p)["best"]
        procs = [run_worker(q, sf_dir, rep) for _ in range(4)]
        times = [last_json(p)["best"] for p in procs]
        eff = round(single / max(times), 3)
        results[q] = {"t_1x4": single, "t_4x4": times, "efficiency": eff}
        print(json.dumps({q: results[q]}), flush=True)
    print(json.dumps({"executor_scaling": results}))


if __name__ == "__main__":
    main()
