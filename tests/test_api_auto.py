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


def test_answer_auto_routes_all_tiers(spark):
    """answer_auto: tabular mapping → pushdown path (orders-only scan);
    document mapping → find() composition; mixed → full-plan fallback
    with identical results."""
    import json as _json
    from morph_xr2rml_spark.api import answer_auto
    from morph_xr2rml_spark.examples import (TPCH_KG_MAPPING, tpch_tables)
    from morph_xr2rml_spark.model import MappingDocument
    from morph_xr2rml_spark.sources import SourceCatalog
    P = "PREFIX ex: <http://example.com/>\n"
    sf = "/root/testdata/sf0.001"

    # tabular → answer_tabular (TM elimination visible in the plan)
    mapping = MappingDocument.from_text(TPCH_KG_MAPPING)
    df = answer_auto(spark, mapping, P +
                     "SELECT ?p ?o WHERE { <http://example.org/order/1> ?p ?o }",
                     tables=tpch_tables(spark, sf))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "nation.parquet" not in plan and "region.parquet" not in plan
    assert df.count() == 5

    # document → answer_documents ($renderIn composed)
    doc_map = MappingDocument.from_text("""
    @prefix rr:  <http://www.w3.org/ns/r2rml#> .
    @prefix xrr: <http://i3s.unice.fr/xr2rml#> .
    @prefix ex:  <http://example.com/> .
    <#D> a rr:TriplesMap;
        xrr:logicalSource [ xrr:query "db.d.find({})" ];
        rr:subjectMap [ rr:template "http://x/{$.id}" ];
        rr:predicateObjectMap [ rr:predicate ex:v; rr:objectMap [ xrr:reference "$.v" ] ].
    """)
    docs = spark.createDataFrame(
        [( _json.dumps({"id": i, "v": f"x{i}"}),) for i in range(5)],
        "content string")
    cat = SourceCatalog().register_collection("d", docs)
    df = answer_auto(spark, doc_map, P + 'SELECT ?s WHERE { ?s ex:v "x2" }',
                     catalog=cat)
    assert [r.s for r in df.collect()] == ["<http://x/2>"]

    # mixed mapping (one tabular TM + one doc TM) → fallback, correct
    mixed = MappingDocument.from_text("""
    @prefix rr:  <http://www.w3.org/ns/r2rml#> .
    @prefix xrr: <http://i3s.unice.fr/xr2rml#> .
    @prefix ex:  <http://example.com/> .
    <#T> a rr:TriplesMap;
        rr:logicalTable [ rr:tableName "nation" ];
        rr:subjectMap [ rr:template "http://x/n/{n_nationkey}" ];
        rr:predicateObjectMap [ rr:predicate ex:name; rr:objectMap [ rr:column "n_name" ] ].
    <#D> a rr:TriplesMap;
        xrr:logicalSource [ xrr:query "db.d.find({})" ];
        rr:subjectMap [ rr:template "http://x/d/{$.id}" ];
        rr:predicateObjectMap [ rr:predicate ex:v; rr:objectMap [ xrr:reference "$.v" ] ].
    """)
    df = answer_auto(spark, mixed, P + "SELECT ?s ?o WHERE { ?s ex:v ?o }",
                     catalog=cat,
                     tables={"nation": spark.read.parquet(f"{sf}/nation.parquet")})
    assert df.count() == 5


def test_materialize_auto_all_native_eliminates_dedup(spark):
    """All-native mappings route through NativeCompiler.triples so the
    uniqueness proof can skip the dedup exchange."""
    from morph_xr2rml_spark.api import materialize_auto
    from morph_xr2rml_spark.examples import TPCH_KG_MAPPING, tpch_tables
    from morph_xr2rml_spark.model import MappingDocument
    mapping = MappingDocument.from_text(TPCH_KG_MAPPING)
    df = materialize_auto(spark, mapping,
                          tables=tpch_tables(spark, "/root/testdata/sf0.001"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Aggregate" not in plan       # dedup exchange eliminated
    assert df.count() == 8335
