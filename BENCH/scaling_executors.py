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
import os, shutil, sys, time, json
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_SCALE_REP"] = {rep!r}
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "8g"
os.environ["SPARK_GRAFT_LOCAL_DIR"] = "/dev/shm/sg_exec_%d" % os.getpid()
import bench
spark = bench.build_spark(4)
spark.sparkContext.setLogLevel("ERROR")
sf = {sf_dir!r}
query = {query!r}
if query == "kg_repo_corpus_full":
    # the COMPLETE pipeline: scan -> translate -> dedup -> parquet sink
    # (the write is part of the timed region; a real materialization
    # job ends at the triple store, not at a count).  SG_FULL_OUT picks
    # the sink medium — /tmp (one shared disk) vs /dev/shm (tmpfs) —
    # to attribute write-stage contention to the device.
    fn = bench.queries()["kg_repo_corpus"]
    out = os.environ.get("SG_FULL_OUT", "/tmp") + "/sg_full_%d" % os.getpid()
    best = None
    for _ in range(2):
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        fn(spark, sf).write.mode("overwrite").parquet(out)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    n = spark.read.parquet(out).count()
    shutil.rmtree(out, ignore_errors=True)
else:
    fn = bench.queries()[query]
    qdir = sf if query.startswith("kg_") else bench.ensure_scaled_tables(spark, sf)
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


PREP = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_SCALE_REP"] = {rep!r}
import bench
spark = bench.build_spark(8)
spark.sparkContext.setLogLevel("ERROR")
bench.ensure_corpus(spark, {sf_dir!r})
bench.ensure_scaled_tables(spark, {sf_dir!r})
spark.stop()
print("PREP_DONE")
"""


def ensure_inputs(sf_dir: str, rep: str) -> None:
    """Materialize the replicated corpus/tables ONCE, before any timed
    worker starts (concurrent workers would race to build it, and a
    build overlapping a measurement would pollute it)."""
    code = PREP.format(repo=REPO, rep=rep, sf_dir=sf_dir)
    f = tempfile.NamedTemporaryFile("w", suffix=".py", delete=False)
    f.write(code)
    f.close()
    subprocess.run([sys.executable, f.name], check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rep = os.environ.get("SPARK_GRAFT_SCALE_REP", "40")
    queries = os.environ.get("SPARK_GRAFT_EXEC_QUERIES",
                             "kg_repo_corpus,kg_tpch,dedup_minhash_lsh") \
        .split(",")
    # kg_tpch* build their replicated tables in-plan and need neither the
    # corpus nor the scaled ops tables — skip the (expensive) prep when
    # every query is self-contained
    if not all(q.startswith("kg_tpch") for q in queries):
        ensure_inputs(sf_dir, rep)
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
