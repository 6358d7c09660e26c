"""spark-submit entry point (north rule: ships via spark-submit --py-files).

Usage:
    cd /root/repo && zip -qr /tmp/mxs.zip morph_xr2rml_spark
    spark-submit --master local[8] --py-files /tmp/mxs.zip \
        BENCH/submit_job.py <sf_dir> <out_dir>

Materializes the repo-corpus KG with the resumable sink and prints one
JSON status line (triples, lineage violations, seconds).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mxs_submit_out"

    from pyspark.sql import SparkSession, functions as F
    spark = SparkSession.builder.appName("mxs-materialize").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from morph_xr2rml_spark.examples import LINEITEM_JSON_MAPPING, orderdocs_df
    from morph_xr2rml_spark.lineage import integrity_violations
    from morph_xr2rml_spark.model import MappingDocument
    from morph_xr2rml_spark.sink import ResumableMaterializer
    from morph_xr2rml_spark.sources import SourceCatalog

    t0 = time.time()
    corpus = orderdocs_df(spark, sf_dir).select(
        "content", F.sha1(F.col("content")).alias("commit"))
    violations = integrity_violations(corpus).count()

    catalog = SourceCatalog().register_collection("orderdocs", corpus)
    mapping = MappingDocument.from_text(LINEITEM_JSON_MAPPING)
    rm = ResumableMaterializer(spark, mapping, catalog, out_dir)
    manifest = rm.run()
    n = rm.triples().count()
    print(json.dumps({
        "triples": n,
        "lineage_violations": violations,
        "triples_maps": {k: v["triples"]
                         for k, v in manifest["triples_maps"].items()},
        "seconds": round(time.time() - t0, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
