"""Round-2 fixes: property-path fixpoint, zero-condition ROMs, $ne /
numeric-eq filter semantics, per-TM OFFSET, streaming filter parity."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from morph_xr2rml_spark.api import materialize_auto
from morph_xr2rml_spark.engine import SparkMaterializer, materialize
from morph_xr2rml_spark.model import MappingDocument
from morph_xr2rml_spark.native import NativeCompiler
from morph_xr2rml_spark.sources import SourceCatalog, mongo_filter_to_column
from morph_xr2rml_spark.sparql import SparqlEngine


def _chain_triples(spark, n):
    """<urn:0> ex:next <urn:1> ... — a chain of depth n."""
    rows = [(f"<urn:{i}>", "<http://example.com/next>", f"<urn:{i + 1}>", None)
            for i in range(n)]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, graph string")


# ---------------------------------------------------------------------------
# property paths: fixpoint, not a silent 16-hop truncation
# ---------------------------------------------------------------------------

def test_path_plus_runs_to_fixpoint_beyond_16_hops(spark):
    depth = 40
    eng = SparqlEngine(_chain_triples(spark, depth))
    rows = eng.sql("PREFIX ex: <http://example.com/> "
                   "SELECT ?a ?b WHERE { ?a ex:next+ ?b . }").collect()
    # full closure of a chain of n edges has n*(n+1)/2 pairs
    assert len(rows) == depth * (depth + 1) // 2
    got = {(r.a, r.b) for r in rows}
    assert ("<urn:0>", f"<urn:{depth}>") in got  # the 40-hop pair


def test_path_cap_raises_instead_of_truncating(spark):
    eng = SparqlEngine(_chain_triples(spark, 10), path_max_hops=3)
    with pytest.raises(RuntimeError, match="safety cap"):
        eng.sql("PREFIX ex: <http://example.com/> "
                "SELECT ?a ?b WHERE { ?a ex:next+ ?b . }").collect()


# ---------------------------------------------------------------------------
# zero-join-condition refobjectmaps: empty result, never a cross product
# ---------------------------------------------------------------------------

NOCOND_DOC_MAPPING = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix ex: <http://example.com/> .
<#A> xrr:logicalSource [ xrr:query "db.a.find({})" ];
  rr:subjectMap [ rr:template "http://a/{$.id}" ];
  rr:predicateObjectMap [ rr:predicate ex:ref;
    rr:objectMap [ rr:parentTriplesMap <#B> ] ].
<#B> xrr:logicalSource [ xrr:query "db.b.find({})" ];
  rr:subjectMap [ rr:template "http://b/{$.id}" ];
  rr:predicateObjectMap [ rr:predicate ex:name;
                          rr:objectMap [ xrr:reference "$.name" ] ].
"""

NOCOND_RDB_MAPPING = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix ex: <http://example.com/> .
<#A> rr:logicalTable [ rr:tableName "ta" ];
  rr:subjectMap [ rr:template "http://a/{id}" ];
  rr:predicateObjectMap [ rr:predicate ex:ref;
    rr:objectMap [ rr:parentTriplesMap <#B> ] ].
<#B> rr:logicalTable [ rr:tableName "tb" ];
  rr:subjectMap [ rr:template "http://b/{id}" ];
  rr:predicateObjectMap [ rr:predicate ex:name; rr:objectMap [ rr:column "name" ] ].
"""


def test_nocond_rom_document_engine_empty(spark):
    mapping = MappingDocument.from_text(NOCOND_DOC_MAPPING)
    cat = SourceCatalog()
    cat.register_collection("a", spark.createDataFrame(
        [(json.dumps({"id": i}),) for i in range(3)], "content string"))
    cat.register_collection("b", spark.createDataFrame(
        [(json.dumps({"id": i, "name": f"n{i}"}),) for i in range(3)],
        "content string"))
    out = materialize(spark, mapping, cat).collect()
    ref_triples = [r for r in out if r.pred == "<http://example.com/ref>"]
    assert ref_triples == []          # NOT a 3x3 cross product
    assert len(out) > 0               # other triples still produced


def test_nocond_rom_native_compiler_empty(spark):
    mapping = MappingDocument.from_text(NOCOND_RDB_MAPPING)
    ta = spark.createDataFrame([(1,), (2,)], "id int")
    tb = spark.createDataFrame([(1, "x"), (2, "y")], "id int, name string")
    out = NativeCompiler(spark, mapping, {"ta": ta, "tb": tb}).triples().collect()
    assert [r for r in out if r.pred == "<http://example.com/ref>"] == []
    assert len(out) > 0


# ---------------------------------------------------------------------------
# find() filter semantics: $ne keeps missing fields; numeric eq matches
# cross-representation (3 vs 3.0) via the Python fallback
# ---------------------------------------------------------------------------

NE_MAPPING = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix ex: <http://example.com/> .
<#T> xrr:logicalSource [ xrr:query "db.docs.find({status: {$ne: 'deleted'}})" ];
  rr:subjectMap [ rr:template "http://d/{$.id}" ];
  rr:predicateObjectMap [ rr:predicate ex:id; rr:objectMap [ xrr:reference "$.id" ] ].
"""


def test_ne_keeps_missing_field_docs(spark):
    mapping = MappingDocument.from_text(NE_MAPPING)
    docs = [{"id": 1, "status": "deleted"},
            {"id": 2, "status": "live"},
            {"id": 3}]                      # no status: Mongo $ne keeps it
    cat = SourceCatalog().register_collection(
        "docs", spark.createDataFrame([(json.dumps(d),) for d in docs],
                                      "content string"))
    out = materialize(spark, mapping, cat).collect()
    subs = {r.subj for r in out}
    assert subs == {"<http://d/2>", "<http://d/3>"}


NUMEQ_MAPPING = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix ex: <http://example.com/> .
<#T> xrr:logicalSource [ xrr:query "db.docs.find({v: 3})" ];
  rr:subjectMap [ rr:template "http://d/{$.id}" ];
  rr:predicateObjectMap [ rr:predicate ex:id; rr:objectMap [ xrr:reference "$.id" ] ].
"""


def test_numeric_eq_matches_cross_representation(spark):
    assert mongo_filter_to_column("{v: 3}", "content") is None  # Python path
    mapping = MappingDocument.from_text(NUMEQ_MAPPING)
    docs = [{"id": 1, "v": 3.0},   # 3.0 == 3 in Mongo and Python
            {"id": 2, "v": 3},
            {"id": 3, "v": "3"},   # string "3" does NOT match numeric 3
            {"id": 4, "v": 4}]
    cat = SourceCatalog().register_collection(
        "docs", spark.createDataFrame([(json.dumps(d),) for d in docs],
                                      "content string"))
    out = materialize(spark, mapping, cat).collect()
    assert {r.subj for r in out} == {"<http://d/1>", "<http://d/2>"}


# ---------------------------------------------------------------------------
# per-TM OFFSET (datatranslation.offset compat)
# ---------------------------------------------------------------------------

SIMPLE_DOC_MAPPING = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix ex: <http://example.com/> .
<#T> xrr:logicalSource [ xrr:query "db.docs.find({})" ];
  rr:subjectMap [ rr:template "http://d/{$.id}" ];
  rr:predicateObjectMap [ rr:predicate ex:id; rr:objectMap [ xrr:reference "$.id" ] ].
"""


def test_tm_offset_and_limit(spark):
    mapping = MappingDocument.from_text(SIMPLE_DOC_MAPPING)
    docs = spark.createDataFrame(
        [(json.dumps({"id": i}),) for i in range(10)],
        "content string").coalesce(1)
    cat = SourceCatalog().register_collection("docs", docs)
    m = SparkMaterializer(spark, mapping, cat, tm_limit=3, tm_offset=2)
    subs = sorted(r.subj for r in m.triples().collect())
    assert subs == ["<http://d/2>", "<http://d/3>", "<http://d/4>"]


def test_properties_offset_parsed():
    from morph_xr2rml_spark.properties import MorphProperties
    p = MorphProperties.from_text(
        "datatranslation.limit=5\ndatatranslation.offset=7\n")
    assert p.tm_limit == 5 and p.tm_offset == 7


# ---------------------------------------------------------------------------
# streaming honors per-TM find() filters (batch parity)
# ---------------------------------------------------------------------------

FILTERED_STREAM_MAPPING = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix ex: <http://example.com/> .
<#T> xrr:logicalSource [ xrr:query "db.docs.find({kind: 'keep'})" ];
  rr:subjectMap [ rr:template "http://d/{$.id}" ];
  rr:predicateObjectMap [ rr:predicate ex:id; rr:objectMap [ xrr:reference "$.id" ] ].
"""


def test_stream_applies_find_filter(spark):
    from morph_xr2rml_spark.streaming import stream_triples
    stream_dir, ckpt = "/tmp/mxs_stream_filt", "/tmp/mxs_stream_filt_ckpt"
    shutil.rmtree(stream_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    os.makedirs(stream_dir)
    docs = [{"id": 1, "kind": "keep"}, {"id": 2, "kind": "drop"},
            {"id": 3, "kind": "keep"}]
    with open(f"{stream_dir}/docs.json", "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    mapping = MappingDocument.from_text(FILTERED_STREAM_MAPPING)
    stream = spark.readStream.format("text").load(stream_dir) \
        .withColumnRenamed("value", "content")
    q = (stream_triples(mapping, stream)
         .writeStream.format("memory").queryName("t_filt")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    subs = {r.subj for r in spark.sql("select subj from t_filt").collect()}
    assert subs == {"<http://d/1>", "<http://d/3>"}


# ---------------------------------------------------------------------------
# materializer cache cleanup
# ---------------------------------------------------------------------------

def test_materializer_cleanup_unpersists(spark):
    mapping = MappingDocument.from_text(NOCOND_DOC_MAPPING)
    cat = SourceCatalog()
    cat.register_collection("a", spark.createDataFrame(
        [(json.dumps({"id": 1}),)], "content string"))
    cat.register_collection("b", spark.createDataFrame(
        [(json.dumps({"id": 1, "name": "n"}),)], "content string"))
    m = SparkMaterializer(spark, mapping, cat)
    m.triples().collect()
    assert m._persisted                      # child stage was cached
    cached = m._persisted[0]
    assert cached.storageLevel.useMemory or cached.storageLevel.useDisk
    m.cleanup()
    assert not m._persisted
    assert not (cached.storageLevel.useMemory or cached.storageLevel.useDisk)
