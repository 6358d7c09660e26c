"""materialize_auto routing: native TMs use pure-Column plans, document
TMs the Arrow stage, in one call."""

import json

import pytest
from fixtures_data import STUDENTS, STUDENTS_JSON

from morph_xr2rml_spark.api import materialize_auto
from morph_xr2rml_spark.local_engine import materialize_local
from morph_xr2rml_spark.model import MappingDocument
from morph_xr2rml_spark.sources import SourceCatalog

MIXED_MAPPING = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix ex: <http://example.com/> .

# tabular TM → native compiler
<#Nations>
    rr:logicalTable [ rr:tableName "nation" ];
    rr:subjectMap [ rr:template "http://example.org/nation/{n_nationkey}"; rr:class ex:Nation ];
    rr:predicateObjectMap [ rr:predicate ex:name; rr:objectMap [ rr:column "n_name" ] ].

# JSON-document TM → document compiler
<#Students>
    xrr:logicalSource [ xrr:query "db.students.find({})" ];
    rr:subjectMap [ rr:template "http://example.org/student/{$._id}"; rr:class ex:Student ];
    rr:predicateObjectMap [ rr:predicate ex:activity;
                            rr:objectMap [ xrr:reference "$.Hobbies.*.hobby" ] ].
"""


def test_auto_routes_and_combines(spark):
    mapping = MappingDocument.from_text(MIXED_MAPPING)
    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    cat = SourceCatalog().register_collection(
        "students",
        spark.createDataFrame([(d,) for d in STUDENTS_JSON], "content string"))
    out = materialize_auto(spark, mapping, catalog=cat,
                           tables={"nation": nation})
    rows = out.collect()
    preds = {r.pred for r in rows}
    assert "<http://example.com/name>" in preds      # native side
    assert "<http://example.com/activity>" in preds  # document side
    n_nations = nation.count()
    assert sum(1 for r in rows
               if r.obj == "<http://example.com/Nation>") == n_nations

    # routing check: only one TM qualifies as native
    from morph_xr2rml_spark.native import is_tabular_compilable
    assert is_tabular_compilable(mapping.triples_maps["#Nations"])
    assert not is_tabular_compilable(mapping.triples_maps["#Students"])


def test_auto_document_only_matches_oracle(spark):
    mapping_text = MIXED_MAPPING.split("# JSON-document")[0] + """
<#Students>
    xrr:logicalSource [ xrr:query "db.students.find({})" ];
    rr:subjectMap [ rr:template "http://example.org/student/{$._id}" ];
    rr:predicateObjectMap [ rr:predicate ex:activity;
                            rr:objectMap [ xrr:reference "$.Hobbies.*.hobby" ] ].
"""
    # drop the tabular TM: mapping with only the doc TM
    mapping = MappingDocument.from_text("""
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix ex: <http://example.com/> .
<#Students>
    xrr:logicalSource [ xrr:query "db.students.find({})" ];
    rr:subjectMap [ rr:template "http://example.org/student/{$._id}" ];
    rr:predicateObjectMap [ rr:predicate ex:activity;
                            rr:objectMap [ xrr:reference "$.Hobbies.*.hobby" ] ].
""")
    cat = SourceCatalog().register_collection(
        "students",
        spark.createDataFrame([(d,) for d in STUDENTS_JSON], "content string"))
    got = {tuple(r) for r in materialize_auto(spark, mapping, catalog=cat).collect()}
    want = materialize_local(mapping, {"students": STUDENTS})
    assert got == want
