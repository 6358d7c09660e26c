"""Streaming materialization: same triples as batch, via a file stream
with availableNow + memory sink."""

import json
import os
import shutil

import pytest
from fixtures_data import MAPPING1_PATH, STUDENTS, STUDENTS_JSON

from morph_xr2rml_spark.local_engine import materialize_local
from morph_xr2rml_spark.model import MappingDocument
from morph_xr2rml_spark.streaming import stream_triples

from conftest import requires_reference

pytestmark = requires_reference

STREAM_DIR = "/tmp/mxs_stream_in"
CKPT = "/tmp/mxs_stream_ckpt"

SIMPLE_MAPPING = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix ex: <http://example.com/> .
<#T> xrr:logicalSource [ xrr:query "db.students.find({})" ];
  rr:subjectMap [ rr:template "http://example.org/student/{$._id}"; rr:class ex:Student ];
  rr:predicateObjectMap [ rr:predicate ex:activity;
                          rr:objectMap [ xrr:reference "$.Hobbies.*.hobby"; rr:language "en" ] ].
"""


def test_stream_matches_batch(spark):
    shutil.rmtree(STREAM_DIR, ignore_errors=True)
    shutil.rmtree(CKPT, ignore_errors=True)
    os.makedirs(STREAM_DIR)
    for i, doc in enumerate(STUDENTS_JSON):
        with open(f"{STREAM_DIR}/doc{i}.json", "w") as f:
            f.write(doc + "\n")

    mapping = MappingDocument.from_text(SIMPLE_MAPPING)
    stream = spark.readStream.format("text").load(STREAM_DIR) \
        .withColumnRenamed("value", "content")
    triples = stream_triples(mapping, stream)
    q = (triples.writeStream.format("memory").queryName("t_out")
         .option("checkpointLocation", CKPT)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {tuple(r) for r in spark.sql(
        "select subj, pred, obj, graph from t_out").distinct().collect()}
    want = materialize_local(mapping, {"students": STUDENTS})
    assert got == want


def test_stream_rejects_rom_and_batch_df(spark):
    mapping = MappingDocument.from_file(MAPPING1_PATH)  # has refobjectmap
    stream = spark.readStream.format("rate").load() \
        .selectExpr("cast(value as string) as content")
    with pytest.raises(ValueError, match="refobjectmap"):
        stream_triples(mapping, stream)

    batch_df = spark.createDataFrame([("{}",)], "content string")
    simple = MappingDocument.from_text(SIMPLE_MAPPING)
    with pytest.raises(ValueError, match="streaming"):
        stream_triples(simple, batch_df)


def test_stream_gate_matches_batch_oracle(spark):
    """The streaming gate query (micro-batched materialization of the
    lineitem JSON mapping) equals the batch engine output at sf0.001."""
    from morph_xr2rml_spark.examples import (kg_lineitem_json_triples,
                                             stream_kg_lineitem_json)
    sf = "/root/testdata/sf0.001"
    got = sorted(map(tuple, stream_kg_lineitem_json(spark, sf).collect()))
    want = sorted(map(tuple, kg_lineitem_json_triples(spark, sf).collect()))
    assert got == want and len(got) > 0
