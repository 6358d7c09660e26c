"""Physical-plan audit: counts the properties we tune for (pruned scans,
broadcast joins, Python stages, explodes) in each headline query's
executed plan at sf0.001, and prints a markdown summary.

Usage: python BENCH/plan_audit.py [sf_dir]   (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def audit(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    formatted = df._sc._jvm.org.apache.spark.sql.execution.ExplainUtils if False else None
    txt = plan
    counts = {
        "parquet scans": len(re.findall(r"FileScan parquet|Scan parquet", txt)),
        "broadcast joins": len(re.findall(r"BroadcastHashJoin", txt)),
        "sort-merge joins": len(re.findall(r"SortMergeJoin", txt)),
        "shuffled hash joins": len(re.findall(r"ShuffledHashJoin", txt)),
        "generate/explode": len(re.findall(r"Generate explode", txt)),
        "Python stages": len(re.findall(r"MapInPandas|ArrowEvalPython|BatchEvalPython", txt)),
        "exchanges": len(re.findall(r"Exchange ", txt)),
        "partial aggs before exchange": len(re.findall(
            r"HashAggregate\(keys=\[_h1[^\]]*\], functions=\[partial", txt)),
        "semi-join existence probes": len(re.findall(r"LeftSemi", txt)),
        "pushed filters": len(re.findall(r"PushedFilters: \[[^\]]*EqualTo", txt)),
    }
    schemas = sorted(set(re.findall(r"ReadSchema: struct<([^>]*)>", txt)))
    return {"counts": counts, "schemas": schemas}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    queries = e.queries()
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "kg_tpch_triples", "kg_lineitem_json_triples",
        "sparql_customer_nation", "sparql_describe", "sparql_lang_filter",
        "dedup_minhash_lsh", "dedup_embedding_cosine", "events_sessionize",
        "sparql_pushdown_point", "sparql_pushdown_doc"]
    for name in names:
        df = queries[name](spark, sf)
        a = audit(df)
        print(f"\n## {name}")
        print("- " + "; ".join(f"{k}: {v}" for k, v in a["counts"].items()))
        for s in a["schemas"]:
            cols = ",".join(c.split(":")[0] for c in s.split(",") if c)
            print(f"- pruned scan columns: {cols}")
    spark.stop()


if __name__ == "__main__":
    main()
