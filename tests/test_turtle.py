"""Turtle parser tests against the reference's real mapping files."""

from morph_xr2rml_spark import namespaces as NS
from morph_xr2rml_spark.turtle import parse_turtle, parse_turtle_file

from conftest import requires_reference

pytestmark = requires_reference

REF = "/root/reference/morph-xr2rml-dist/example_mongo"


def test_prefixes_and_simple_triples():
    g = parse_turtle("""
        @prefix ex: <http://example.com/> .
        ex:a ex:p ex:b ; ex:q "lit" , "lit2"@en , "3"^^<http://www.w3.org/2001/XMLSchema#int> .
    """)
    assert g.prefixes["ex"] == "http://example.com/"
    assert (("iri", "http://example.com/a"), ("iri", "http://example.com/p"),
            ("iri", "http://example.com/b")) in g.triples
    objs = g.objects(("iri", "http://example.com/a"), "http://example.com/q")
    assert ("lit", "lit", None, None) in objs
    assert ("lit", "lit2", None, "en") in objs
    assert ("lit", "3", "http://www.w3.org/2001/XMLSchema#int", None) in objs


def test_bnode_property_list_and_a():
    g = parse_turtle("""
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        <#TM> a rr:TriplesMap ; rr:subjectMap [ rr:template "http://x/{id}" ; rr:class <http://x/C> ] .
    """)
    tm = ("iri", "#TM")
    sm = g.object(tm, "http://www.w3.org/ns/r2rml#subjectMap")
    assert sm is not None and sm[0] == "bnode"
    assert g.value(sm, "http://www.w3.org/ns/r2rml#template") == "http://x/{id}"


def test_triple_quoted_strings():
    g = parse_turtle('''
        @prefix xrr: <http://i3s.unice.fr/xr2rml#> .
        <#a> xrr:query """db.students.find( { 'FullName' : {$exists: 1} } )""" .
    ''')
    v = g.value(("iri", "#a"), "http://i3s.unice.fr/xr2rml#query")
    assert "FullName" in v and v.startswith("db.students.find")


def test_parse_reference_mappings():
    for i in (1, 2, 3, 4, 5):
        g = parse_turtle_file(f"{REF}/mapping{i}.ttl")
        assert len(g.triples) > 5, f"mapping{i}.ttl parsed to too few triples"


def test_numbers_and_booleans():
    g = parse_turtle("""
        @prefix ex: <http://example.com/> .
        ex:a ex:n 42 ; ex:d 4.2 ; ex:b true .
    """)
    a = ("iri", "http://example.com/a")
    assert g.object(a, "http://example.com/n") == ("lit", "42", NS.XSD + "integer", None)
    assert g.object(a, "http://example.com/b") == ("lit", "true", NS.XSD + "boolean", None)
