"""native_json schema-sampling robustness: fields first appearing after
the sample window or with conflicting sampled types must not silently
drop or drift triples — materialize_auto falls back to the document
compiler for those TMs (VERDICT r1 item 7 / ADVICE native_json.py:219)."""

import json

from morph_xr2rml_spark.api import materialize_auto
from morph_xr2rml_spark.model import MappingDocument
from morph_xr2rml_spark.native_json import JsonNativeCompiler
from morph_xr2rml_spark.sources import SourceCatalog

MAPPING = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix ex: <http://example.com/> .
<#T> xrr:logicalSource [ xrr:query "db.docs.find({})" ];
  rr:subjectMap [ rr:template "http://d/{$.id}" ];
  rr:predicateObjectMap [ rr:predicate ex:v; rr:objectMap [ xrr:reference "$.v" ] ].
"""


def _catalog(spark, docs):
    return SourceCatalog().register_collection(
        "docs", spark.createDataFrame([(json.dumps(d),) for d in docs],
                                      "content string").coalesce(1))


def test_unseen_field_is_flagged_and_falls_back(spark):
    # 'v' first appears AFTER the sample window of 3 rows
    docs = [{"id": i} for i in range(3)] + [{"id": 3, "v": 7}]
    mapping = MappingDocument.from_text(MAPPING)
    tm = next(iter(mapping.triples_maps.values()))
    jc = JsonNativeCompiler(spark, mapping, _catalog(spark, docs), sample_n=3)
    unsafe = jc.unsafe_paths(tm)
    assert unsafe and "never seen" in unsafe[0]
    # the auto-router must emit the late row's triple with the DOCUMENT
    # engine's typed form, not drop it or plain-literal it
    out = materialize_auto(spark, mapping, catalog=_catalog(spark, docs))
    objs = {r.obj for r in out.collect() if r.pred == "<http://example.com/v>"}
    assert objs == {'"7"^^<http://www.w3.org/2001/XMLSchema#integer>'}


def test_conflicting_types_flagged_and_fall_back(spark):
    # long in one doc, double in another: document engine emits
    # xsd:integer AND xsd:decimal respectively; one merged schema cannot
    docs = [{"id": 1, "v": 3}, {"id": 2, "v": 3.5}]
    mapping = MappingDocument.from_text(MAPPING)
    tm = next(iter(mapping.triples_maps.values()))
    jc = JsonNativeCompiler(spark, mapping, _catalog(spark, docs))
    unsafe = jc.unsafe_paths(tm)
    assert unsafe and "conflicting" in unsafe[0]
    out = materialize_auto(spark, mapping, catalog=_catalog(spark, docs))
    objs = {r.obj for r in out.collect() if r.pred == "<http://example.com/v>"}
    assert objs == {'"3"^^<http://www.w3.org/2001/XMLSchema#integer>',
                    '"3.5"^^<http://www.w3.org/2001/XMLSchema#decimal>'}


def test_stable_schema_stays_on_json_native_tier(spark):
    docs = [{"id": i, "v": i} for i in range(5)]
    mapping = MappingDocument.from_text(MAPPING)
    tm = next(iter(mapping.triples_maps.values()))
    jc = JsonNativeCompiler(spark, mapping, _catalog(spark, docs))
    assert jc.unsafe_paths(tm) == []
