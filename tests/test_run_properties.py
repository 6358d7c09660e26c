"""MorphRunner-equivalent facade: morph.properties → materialize →
serialize in the configured output syntax."""

import json

from morph_xr2rml_spark.api import run_materialization
from morph_xr2rml_spark.sources import SourceCatalog

MAPPING = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix xrr: <http://i3s.unice.fr/xr2rml#> .
@prefix ex: <http://example.com/> .
<#T> xrr:logicalSource [ xrr:query "db.docs.find({})" ];
  rr:subjectMap [ rr:template "http://d/{$.id}" ];
  rr:predicateObjectMap [ rr:predicate ex:name; rr:objectMap [ xrr:reference "$.name" ] ].
"""


def test_run_materialization_turtle_output(spark, tmp_path):
    mpath = tmp_path / "mapping.ttl"
    mpath.write_text(MAPPING)
    props = tmp_path / "morph.properties"
    props.write_text(
        f"mappingdocument.file.path={mpath}\noutput.syntax.rdf=TURTLE\n")
    docs = [{"id": 1, "name": "Alpha"}, {"id": 2, "name": "Beta"}]
    cat = SourceCatalog().register_collection(
        "docs", spark.createDataFrame([(json.dumps(d),) for d in docs],
                                      "content string"))
    out = tmp_path / "out.ttl"
    df = run_materialization(spark, str(props), catalog=cat,
                             output_path=str(out))
    assert df.count() == 2
    text = out.read_text()
    assert "@prefix ex: <http://example.com/> ." in text
    assert 'ex:name "Alpha"' in text


def test_run_materialization_limit_offset(spark, tmp_path):
    mpath = tmp_path / "mapping.ttl"
    mpath.write_text(MAPPING)
    props = tmp_path / "morph.properties"
    props.write_text(f"mappingdocument.file.path={mpath}\n"
                     "datatranslation.limit=2\ndatatranslation.offset=1\n")
    docs = [{"id": i, "name": f"n{i}"} for i in range(5)]
    cat = SourceCatalog().register_collection(
        "docs", spark.createDataFrame([(json.dumps(d),) for d in docs],
                                      "content string").coalesce(1))
    df = run_materialization(spark, str(props), catalog=cat)
    subs = sorted(r.subj for r in df.select("subj").distinct().collect())
    assert subs == ["<http://d/1>", "<http://d/2>"]
