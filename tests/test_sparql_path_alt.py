"""Property-path alternatives `p1|p2` and zero-or-one `p?`."""

import pytest

from morph_xr2rml_spark.sparql import SparqlEngine

PREFIX = "PREFIX ex: <http://example.com/> "

ROWS = [
    ("<urn:a>", "<http://example.com/p>", "<urn:b>", None),
    ("<urn:b>", "<http://example.com/q>", "<urn:c>", None),
    ("<urn:c>", "<http://example.com/r>", "<urn:d>", None),
]


@pytest.fixture(scope="module")
def eng(spark):
    df = spark.createDataFrame(
        ROWS, "subj string, pred string, obj string, graph string")
    return SparqlEngine(df)


def test_alternative_path(eng):
    rows = eng.sql(PREFIX + "SELECT ?s ?o WHERE { ?s ex:p|ex:q ?o }").collect()
    assert {(r.s, r.o) for r in rows} == {("<urn:a>", "<urn:b>"),
                                          ("<urn:b>", "<urn:c>")}


def test_alternative_inside_sequence(eng):
    # (p|q)/... — here: p|q followed by q|r covers a→b→c and b→c→d
    rows = eng.sql(PREFIX +
                   "SELECT ?s ?o WHERE { ?s ex:p/ex:q|ex:q/ex:r ?o }").collect()
    assert {(r.s, r.o) for r in rows} == {("<urn:a>", "<urn:c>"),
                                          ("<urn:b>", "<urn:d>")}


def test_zero_or_one(eng):
    rows = eng.sql(PREFIX +
                   "SELECT ?o WHERE { <urn:a> ex:p? ?o }").collect()
    # zero-length: a itself; one hop: b
    assert {r.o for r in rows} == {"<urn:a>", "<urn:b>"}


def test_alt_with_plus(eng):
    # p+|r : transitive p (a→b only) union r (c→d)
    rows = eng.sql(PREFIX +
                   "SELECT ?s ?o WHERE { ?s ex:p+|ex:r ?o }").collect()
    assert {(r.s, r.o) for r in rows} == {("<urn:a>", "<urn:b>"),
                                          ("<urn:c>", "<urn:d>")}
