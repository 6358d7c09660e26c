"""Lineage invariant + checkpoint/resume tests."""

import json
import os
import shutil

import pytest
from fixtures_data import MAPPING1_PATH, MOVIES_JSON, STUDENTS_JSON

from morph_xr2rml_spark.lineage import (integrity_violations,
                                        partition_metrics,
                                        with_content_digest)
from morph_xr2rml_spark.model import MappingDocument
from morph_xr2rml_spark.sink import ResumableMaterializer, write_ntriples
from morph_xr2rml_spark.sources import SourceCatalog

from conftest import requires_reference

pytestmark = requires_reference

OUT = "/tmp/mxs_resume_test"


def _catalog(spark):
    cat = SourceCatalog()
    for name, docs in (("students", STUDENTS_JSON), ("movies", MOVIES_JSON)):
        df = spark.createDataFrame([(d,) for d in docs], "content string")
        cat.register_collection(name, df)
    return cat


def test_integrity_violations(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame([("abc",), ("xyz",)], "content string") \
              .withColumn("commit", F.sha1(F.col("content")))
    assert integrity_violations(df).count() == 0
    bad = df.withColumn("commit", F.lit("0" * 40))
    assert integrity_violations(bad).count() == 2


def test_content_digest_and_partition_metrics(spark):
    df = spark.createDataFrame([("a",), ("b",), ("c",)], "content string")
    d = with_content_digest(df)
    assert d.select("_sha256").distinct().count() == 3
    m = partition_metrics(df).collect()
    assert sum(r.rows for r in m) == 3
    assert all(r.digest_fold is not None for r in m)


def test_resume_skips_completed(spark):
    shutil.rmtree(OUT, ignore_errors=True)
    mapping = MappingDocument.from_file(MAPPING1_PATH)
    rm = ResumableMaterializer(spark, mapping, _catalog(spark), OUT)
    manifest1 = rm.run()
    assert all(e["complete"] for e in manifest1["triples_maps"].values())
    total = rm.triples().count()
    assert total == 50

    # simulate a crash on one TM: mark incomplete + delete its partition
    with open(os.path.join(OUT, "_manifest.json")) as f:
        manifest = json.load(f)
    victim = sorted(manifest["triples_maps"])[0]
    manifest["triples_maps"][victim]["complete"] = False
    with open(os.path.join(OUT, "_manifest.json"), "w") as f:
        json.dump(manifest, f)
    shutil.rmtree(os.path.join(OUT, f"tm={victim}"))

    manifest2 = ResumableMaterializer(spark, mapping, _catalog(spark), OUT).run()
    assert manifest2["triples_maps"][victim]["complete"]
    # no duplicate/lost triples after resume
    assert rm.triples().dropDuplicates(["subj", "pred", "obj", "graph"]).count() == 50
    assert rm.triples().count() == 50

    # lineage metrics recorded per input partition
    assert all("input_partitions" in e and e["input_partitions"]
               for e in manifest2["triples_maps"].values())


def test_write_ntriples(spark):
    shutil.rmtree(OUT, ignore_errors=True)
    mapping = MappingDocument.from_file(MAPPING1_PATH)
    rm = ResumableMaterializer(spark, mapping, _catalog(spark), OUT)
    rm.run(record_lineage=False)
    nt_path = "/tmp/mxs_nt_export"
    shutil.rmtree(nt_path, ignore_errors=True)
    write_ntriples(rm.triples(), nt_path)
    lines = [l for f in os.listdir(nt_path) if f.startswith("part-")
             for l in open(os.path.join(nt_path, f))]
    assert len(lines) == 50
    assert all(l.rstrip().endswith(" .") for l in lines)
