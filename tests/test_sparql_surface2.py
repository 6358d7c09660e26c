"""Round-2 SPARQL surface: typed/lang-tagged literals in patterns,
IN / NOT IN, LANG()/DATATYPE()/langMatches filters, DESCRIBE,
multi-var VALUES, subqueries."""

import pytest
from pyspark.sql import functions as F

from morph_xr2rml_spark.sparql import SparqlEngine, parse_sparql

PREFIX = ("PREFIX ex: <http://example.com/> "
          "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> ")

ROWS = [
    ("<http://ex/d1>", "<http://example.com/label>", '"hello"@en', None),
    ("<http://ex/d1>", "<http://example.com/label>", '"bonjour"@fr', None),
    ("<http://ex/d1>", "<http://example.com/n>",
     '"5"^^<http://www.w3.org/2001/XMLSchema#integer>', None),
    ("<http://ex/d2>", "<http://example.com/label>", '"plain"', None),
    ("<http://ex/d2>", "<http://example.com/n>",
     '"7"^^<http://www.w3.org/2001/XMLSchema#integer>', None),
    ("<http://ex/d2>", "<http://example.com/ref>", "<http://ex/d1>", None),
    ("<http://ex/d3>", "<http://example.com/label>", '"hello"@en-US', None),
]


@pytest.fixture(scope="module")
def eng(spark):
    df = spark.createDataFrame(
        ROWS, "subj string, pred string, obj string, graph string")
    return SparqlEngine(df)


def test_lang_tagged_literal_in_pattern(eng):
    rows = eng.sql(PREFIX + 'SELECT ?s WHERE { ?s ex:label "hello"@en }') \
              .collect()
    assert {r.s for r in rows} == {"<http://ex/d1>"}


def test_typed_literal_in_pattern(eng):
    rows = eng.sql(PREFIX + 'SELECT ?s WHERE { ?s ex:n "5"^^xsd:integer }') \
              .collect()
    assert {r.s for r in rows} == {"<http://ex/d1>"}


def test_lang_function_filter(eng):
    rows = eng.sql(PREFIX + """
        SELECT ?s ?l WHERE { ?s ex:label ?l . FILTER(LANG(?l) = "fr") }
    """).collect()
    assert [(r.s, r.l) for r in rows] == [("<http://ex/d1>", '"bonjour"@fr')]


def test_langmatches_prefix(eng):
    rows = eng.sql(PREFIX + """
        SELECT ?s WHERE { ?s ex:label ?l . FILTER(langMatches(LANG(?l), "en")) }
    """).collect()
    assert {r.s for r in rows} == {"<http://ex/d1>", "<http://ex/d3>"}


def test_datatype_function_filter(eng):
    rows = eng.sql(PREFIX + """
        SELECT ?s WHERE { ?s ex:n ?n . FILTER(DATATYPE(?n) = xsd:integer) }
    """).collect()
    assert {r.s for r in rows} == {"<http://ex/d1>", "<http://ex/d2>"}
    # simple literal → xsd:string
    rows = eng.sql(PREFIX + """
        SELECT ?s WHERE { ?s ex:label ?l . FILTER(DATATYPE(?l) = xsd:string) }
    """).collect()
    assert {r.s for r in rows} == {"<http://ex/d2>"}


def test_in_and_not_in(eng):
    rows = eng.sql(PREFIX + """
        SELECT ?s WHERE { ?s ex:label ?l . FILTER(?s IN (<http://ex/d1>, <http://ex/d3>)) }
    """).collect()
    assert {r.s for r in rows} == {"<http://ex/d1>", "<http://ex/d3>"}
    rows = eng.sql(PREFIX + """
        SELECT ?s ?n WHERE { ?s ex:n ?n . FILTER(?n NOT IN (5)) }
    """).collect()
    assert {r.s for r in rows} == {"<http://ex/d2>"}


def test_describe_iri(eng):
    rows = eng.sql("DESCRIBE <http://ex/d1>").collect()
    got = {(r.subj, r.pred, r.obj) for r in rows}
    # outgoing + incoming
    assert ("<http://ex/d1>", "<http://example.com/n>",
            '"5"^^<http://www.w3.org/2001/XMLSchema#integer>') in got
    assert ("<http://ex/d2>", "<http://example.com/ref>",
            "<http://ex/d1>") in got
    assert len(got) == 4


def test_describe_var(eng):
    rows = eng.sql(PREFIX +
                   'DESCRIBE ?s WHERE { ?s ex:label "plain" }').collect()
    got = {(r.subj, r.pred, r.obj) for r in rows}
    assert all(s == "<http://ex/d2>" or o == "<http://ex/d2>"
               for s, _p, o in got)
    assert len(got) == 3


def test_multivar_values(eng):
    rows = eng.sql(PREFIX + """
        SELECT ?s ?l WHERE {
            ?s ex:label ?l .
            VALUES (?s ?l) { (<http://ex/d1> "hello"@en)
                             (<http://ex/d2> "plain") }
        }""").collect()
    assert {(r.s, r.l) for r in rows} == {
        ("<http://ex/d1>", '"hello"@en'), ("<http://ex/d2>", '"plain"')}


def test_subquery(eng):
    rows = eng.sql(PREFIX + """
        SELECT ?s ?n WHERE {
            ?s ex:n ?n .
            { SELECT ?s WHERE { ?s ex:label "hello"@en } }
        }""").collect()
    assert [(r.s, r.n) for r in rows] == [
        ("<http://ex/d1>", '"5"^^<http://www.w3.org/2001/XMLSchema#integer>')]


def test_parse_shapes():
    q = parse_sparql('SELECT ?x WHERE { ?x <http://p> "v"@en }')
    assert q.where.patterns[0].o == ("lit_exact", '"v"@en')
    q = parse_sparql("DESCRIBE <http://a> <http://b>")
    assert q.describe == [("iri", "http://a"), ("iri", "http://b")]
