"""Extra measurement harness for the optimization round (guide §1).

NOT the frozen bench: this isolates each bench query with the noop sink
(so we time computation, not the count() path), labels jobs, and can dump
``.explain("formatted")`` for any query to plans/r07/.

Usage:
  python bench_extra.py plans [before|after] [query ...]
  python bench_extra.py time  [query ...]        # noop-sink min-of-3
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # the frozen harness: reuse its spark config + query defs


def _capture_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    args = sys.argv[2:]
    tag = None
    if mode == "plans" and args and args[0] in ("before", "after"):
        tag = args[0]
        args = args[1:]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = bench.build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    bench.ensure_corpus(spark, sf_dir)
    ops_dir = bench.ensure_scaled_tables(spark, sf_dir)

    qs = bench.queries()
    names = args or list(qs)

    if mode == "plans":
        outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "plans", "r07")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            qdir = sf_dir if name.startswith("kg_") else ops_dir
            df = qs[name](spark, qdir)
            text = _capture_plan(df)
            path = os.path.join(outdir, f"{name}_{tag or 'before'}.txt")
            with open(path, "w") as f:
                f.write(text)
            print(f"wrote {path} ({len(text)} bytes)")
    else:
        # mode "time": noop sink (computes every column — plan analysis);
        # mode "count": df.count() — the frozen bench.py methodology
        iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "3"))
        times = {}
        for name in names:
            qdir = sf_dir if name.startswith("kg_") else ops_dir
            samples = []
            for i in range(iters):
                spark.sparkContext.setJobDescription(f"{name} iter{i}")
                t0 = time.time()
                df = qs[name](spark, qdir)
                if mode == "count":
                    df.count()
                else:
                    df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            times[name] = {"min": min(samples), "samples": samples}
            print(json.dumps({name: times[name]}), flush=True)
        print(json.dumps({f"{mode}_times": {k: v["min"] for k, v in
                                            times.items()},
                          "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
