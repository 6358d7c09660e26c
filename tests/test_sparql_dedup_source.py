"""dedup_source mode: SPARQL over the RAW (pre-dedup) triple plan must
behave exactly as over the deduplicated table — per-pattern
dedup-after-filter commutes with the constant filters."""

import pytest

from morph_xr2rml_spark.sparql import SparqlEngine

ROWS = [
    ("<urn:s1>", "<http://p/a>", '"1"', None),
    ("<urn:s1>", "<http://p/a>", '"1"', None),         # duplicate row
    ("<urn:s1>", "<http://p/a>", '"2"', None),
    ("<urn:s2>", "<http://p/a>", '"1"', "<urn:g1>"),
    ("<urn:s2>", "<http://p/a>", '"1"', "<urn:g1>"),   # duplicate quad
]


@pytest.fixture(scope="module")
def eng(spark):
    df = spark.createDataFrame(
        ROWS, "subj string, pred string, obj string, graph string")
    return SparqlEngine(df, dedup_source=True)


def test_aggregate_sees_set_semantics(eng):
    rows = eng.sql("SELECT ?s (COUNT(?o) AS ?n) WHERE "
                   "{ ?s <http://p/a> ?o } GROUP BY ?s").collect()
    assert [(r.s, r.n) for r in rows] == [("<urn:s1>", 2)]


def test_graph_clause_dedups_quads(eng):
    rows = eng.sql("SELECT ?s ?o WHERE "
                   "{ GRAPH <urn:g1> { ?s <http://p/a> ?o } }").collect()
    assert [(r.s, r.o) for r in rows] == [("<urn:s2>", '"1"')]


def test_values_cross_join_unbound_vars(eng):
    rows = eng.sql('SELECT ?s ?x ?y WHERE { ?s <http://p/a> "2" . '
                   'VALUES (?x ?y) { ("a" "b") ("c" "d") } }').collect()
    assert sorted((r.s, r.x, r.y) for r in rows) == [
        ("<urn:s1>", '"a"', '"b"'), ("<urn:s1>", '"c"', '"d"')]


def test_subquery_with_aggregate(eng):
    rows = eng.sql("""SELECT ?s ?n WHERE {
        { SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s <http://p/a> ?o }
          GROUP BY ?s }
    }""").collect()
    assert [(r.s, r.n) for r in rows] == [("<urn:s1>", 2)]


def test_path_closure_over_duplicated_edges(spark):
    rows = [("<urn:a>", "<http://p/n>", "<urn:b>", None)] * 3 + \
           [("<urn:b>", "<http://p/n>", "<urn:c>", None)] * 2
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, graph string")
    eng = SparqlEngine(df, dedup_source=True)
    got = {(r.a, r.b) for r in eng.sql(
        "SELECT ?a ?b WHERE { ?a <http://p/n>+ ?b }").collect()}
    assert got == {("<urn:a>", "<urn:b>"), ("<urn:b>", "<urn:c>"),
                   ("<urn:a>", "<urn:c>")}
