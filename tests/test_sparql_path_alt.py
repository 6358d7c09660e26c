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


def test_negated_set_forward(eng):
    # !ex:p : any forward edge whose pred isn't p
    rows = eng.sql(PREFIX + "SELECT ?s ?o WHERE { ?s !ex:p ?o }").collect()
    assert {(r.s, r.o) for r in rows} == {("<urn:b>", "<urn:c>"),
                                          ("<urn:c>", "<urn:d>")}


def test_negated_set_inverse_member(eng):
    # !(^ex:q) : REVERSE edges whose pred isn't q — p and r reversed
    rows = eng.sql(PREFIX +
                   "SELECT ?s ?o WHERE { ?s !(^ex:q) ?o }").collect()
    assert {(r.s, r.o) for r in rows} == {("<urn:b>", "<urn:a>"),
                                          ("<urn:d>", "<urn:c>")}


def test_negated_set_mixed_members(eng):
    # !(ex:p|^ex:q) : forward edges not-p (q: b→c, r: c→d) UNION reverse
    # edges not-q (p rev: b→a, r rev: d→c)
    rows = eng.sql(PREFIX +
                   "SELECT ?s ?o WHERE { ?s !(ex:p|^ex:q) ?o }").collect()
    assert {(r.s, r.o) for r in rows} == {("<urn:b>", "<urn:c>"),
                                          ("<urn:c>", "<urn:d>"),
                                          ("<urn:b>", "<urn:a>"),
                                          ("<urn:d>", "<urn:c>")}


def test_bare_inverse_negated_member(eng):
    # !^ex:q without parens
    rows = eng.sql(PREFIX +
                   "SELECT ?s ?o WHERE { ?s !^ex:q ?o }").collect()
    assert {(r.s, r.o) for r in rows} == {("<urn:b>", "<urn:a>"),
                                          ("<urn:d>", "<urn:c>")}
