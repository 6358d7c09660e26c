"""RDF output serializers (reference syntaxes: TURTLE/N3, RDF/XML,
JSON-LD, N-TRIPLE, N-QUAD) — driver-side pretty writers + the
distributed Turtle writer.  The flagship test: mapping2 materialized →
to_turtle → re-parse → EXACT structural match with the reference's own
golden Turtle (example_mongo/result2.txt) modulo bnode labels."""

import hashlib
import json
import xml.etree.ElementTree as ET

import pytest
from fixtures_data import MOVIES

from morph_xr2rml_spark.local_engine import materialize_local
from morph_xr2rml_spark.model import MappingDocument
from morph_xr2rml_spark.rdf_io import (serialize, to_jsonld, to_nquads,
                                       to_ntriples, to_rdfxml, to_turtle,
                                       write_turtle)
from morph_xr2rml_spark.translate import format_iri, format_literal
from morph_xr2rml_spark.turtle import parse_turtle, parse_turtle_file

from conftest import requires_reference

REF = "/root/reference/morph-xr2rml-dist/example_mongo"

SIMPLE = [
    ("<http://ex/s1>", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
     "<http://ex/T>", None),
    ("<http://ex/s1>", "<http://ex/name>", '"Alice"@en', None),
    ("<http://ex/s1>", "<http://ex/age>",
     '"30"^^<http://www.w3.org/2001/XMLSchema#integer>', None),
    ("<http://ex/s2>", "<http://ex/knows>", "<http://ex/s1>", None),
    ("<http://ex/s2>", "<http://ex/note>", '"hi"', "<http://ex/g1>"),
]


def _term(t):
    if t[0] == "iri":
        return format_iri(t[1])
    if t[0] == "bnode":
        return "_:" + t[1]
    return format_literal(t[1], t[2], t[3])


def _parsed_set(turtle_text: str) -> set:
    g = parse_turtle(turtle_text)
    return {(_term(s), _term(p), _term(o)) for (s, p, o) in g.triples}


def _canon(triples: set) -> set:
    out_edges = {}
    for s, p, o in triples:
        if s.startswith("_:"):
            out_edges.setdefault(s, []).append((p, o))
    memo = {}

    def bhash(b, depth=0):
        if b in memo:
            return memo[b]
        if depth > 50:
            return "_:deep"
        edges = [(p, bhash(o, depth + 1) if o.startswith("_:") else o)
                 for p, o in sorted(out_edges.get(b, []))]
        h = "_:" + hashlib.md5(json.dumps(sorted(edges)).encode()).hexdigest()
        memo[b] = h
        return h

    return {(bhash(s) if s.startswith("_:") else s, p,
             bhash(o) if o.startswith("_:") else o) for s, p, o in triples}


# ---------------------------------------------------------------------------
# Turtle
# ---------------------------------------------------------------------------

@requires_reference
def test_turtle_roundtrip_matches_reference_golden():
    mapping = MappingDocument.from_file(f"{REF}/mapping2.ttl")
    triples = materialize_local(mapping, {"movies": MOVIES})
    text = to_turtle(triples, prefixes={"ex": "http://example.com/"})
    ours = _canon(_parsed_set(text))
    golden = _canon({(_term(s), _term(p), _term(o)) for (s, p, o)
                     in parse_turtle_file(f"{REF}/result2.txt").triples})
    assert ours == golden


@requires_reference
def test_turtle_pretty_shapes():
    mapping = MappingDocument.from_file(f"{REF}/mapping2.ttl")
    triples = materialize_local(mapping, {"movies": MOVIES})
    text = to_turtle(triples, prefixes={"ex": "http://example.com/"})
    assert "@prefix ex: <http://example.com/> ." in text
    assert "( " in text            # rdf:first/rest chain → collection syntax
    assert "[ " in text            # single-ref bnode → inline property list
    assert "ex:name" in text       # prefix compaction
    assert " a " in text or "\na " in text or "    a " in text  # rdf:type → a


def test_turtle_simple_roundtrip():
    text = to_turtle(SIMPLE, prefixes={"ex": "http://ex/"})
    got = _parsed_set(text)
    want = {(s, p, o) for s, p, o, g in SIMPLE if g is None}
    assert got == want


def test_turtle_impure_list_tail_preserves_all_triples():
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    rows = [
        ("<http://s>", "<http://p>", "_:t1", None),
        ("_:t1", f"<{RDF}first>", "<http://e1>", None),
        ("_:t1", f"<{RDF}rest>", "_:t2", None),
        ("_:t2", f"<{RDF}first>", "<http://e2>", None),
        ("_:t2", f"<{RDF}rest>", f"<{RDF}nil>", None),
        ("_:t2", "<http://extra>", '"x"', None),   # impure tail member
    ]
    got = _parsed_set(to_turtle(rows))
    # collection syntax must NOT swallow the impure node's triples
    assert len(got) == len(rows)
    # and a pure chain still inlines as ( ... )
    assert "( " in to_turtle(rows[:5])


# ---------------------------------------------------------------------------
# RDF/XML
# ---------------------------------------------------------------------------

def _rdfxml_to_set(text: str) -> set:
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    root = ET.fromstring(text)
    out = set()
    for desc in root:
        about = desc.get(f"{{{RDF}}}about")
        node_id = desc.get(f"{{{RDF}}}nodeID")
        s = f"<{about}>" if about else f"_:{node_id}"
        for prop in desc:
            pred = prop.tag.replace("{", "").replace("}", "")
            res = prop.get(f"{{{RDF}}}resource")
            nid = prop.get(f"{{{RDF}}}nodeID")
            dt = prop.get(f"{{{RDF}}}datatype")
            lang = prop.get("{http://www.w3.org/XML/1998/namespace}lang")
            if res is not None:
                o = f"<{res}>"
            elif nid is not None:
                o = f"_:{nid}"
            else:
                o = format_literal(prop.text or "", dt, lang)
            out.add((s, f"<{pred}>", o))
    return out


def test_rdfxml_roundtrip():
    text = to_rdfxml(SIMPLE, prefixes={"ex": "http://ex/"})
    got = _rdfxml_to_set(text)
    want = {(s, p, o) for s, p, o, g in SIMPLE if g is None}
    assert got == want


# ---------------------------------------------------------------------------
# JSON-LD / N-Triples / N-Quads / dispatch
# ---------------------------------------------------------------------------

def test_jsonld_structure():
    doc = json.loads(to_jsonld(SIMPLE))
    nodes = {n["@id"]: n for n in doc["@graph"]}
    assert nodes["http://ex/s1"]["@type"] == ["http://ex/T"]
    assert nodes["http://ex/s1"]["http://ex/name"] == [
        {"@value": "Alice", "@language": "en"}]
    assert nodes["http://ex/s1"]["http://ex/age"] == [
        {"@value": "30", "@type": "http://www.w3.org/2001/XMLSchema#integer"}]
    assert nodes["http://ex/s2"]["http://ex/knows"] == [{"@id": "http://ex/s1"}]


def test_ntriples_and_nquads():
    nt = to_ntriples(SIMPLE)
    assert '<http://ex/s1> <http://ex/name> "Alice"@en .' in nt
    assert "g1" not in nt                     # named graph excluded
    nq = to_nquads(SIMPLE)
    assert '<http://ex/s2> <http://ex/note> "hi" <http://ex/g1> .' in nq


def test_serialize_dispatch_all_reference_syntaxes():
    for syntax in ("TURTLE", "N3", "RDF/XML", "RDF/XML-ABBREV",
                   "JSON-LD", "N-TRIPLE", "N-QUAD"):
        out = serialize(SIMPLE, syntax)
        assert "http://ex/s1" in out
    with pytest.raises(ValueError, match="unsupported"):
        serialize(SIMPLE, "TRIG")


# ---------------------------------------------------------------------------
# Distributed Turtle writer
# ---------------------------------------------------------------------------

def test_write_turtle_distributed(spark, tmp_path):
    df = spark.createDataFrame(
        [(s, p, o, g) for s, p, o, g in SIMPLE],
        "subj string, pred string, obj string, graph string")
    out = str(tmp_path / "ttl_out")
    write_turtle(df, out, prefixes={"ex": "http://ex/"})
    text = "\n".join(r.value for r in spark.read.text(out).collect())
    got = _parsed_set(text)
    want = {(s, p, o) for s, p, o, g in SIMPLE if g is None}
    assert got == want


# ---------------------------------------------------------------------------
# SPARQL result sinks: XML (reference default) and TSV
# ---------------------------------------------------------------------------

def test_sparql_xml_and_tsv(spark):
    from morph_xr2rml_spark.sparql import (to_ask_xml, to_sparql_tsv,
                                           to_sparql_xml)
    df = spark.createDataFrame(
        [("<http://ex/a>", '"v1"@en'), ("<http://ex/b>", None)],
        "x string, y string")
    xml = to_sparql_xml(df)
    root = ET.fromstring(xml)
    SR = "http://www.w3.org/2005/sparql-results#"
    vars_ = [v.get("name") for v in root.find(f"{{{SR}}}head")]
    assert vars_ == ["x", "y"]
    results = root.find(f"{{{SR}}}results").findall(f"{{{SR}}}result")
    assert len(results) == 2
    first = {b.get("name"): b for b in results[0]}
    assert first["x"].find(f"{{{SR}}}uri").text == "http://ex/a"
    lit = first["y"].find(f"{{{SR}}}literal")
    assert lit.text == "v1"
    assert lit.get("{http://www.w3.org/XML/1998/namespace}lang") == "en"
    tsv = to_sparql_tsv(df)
    lines = tsv.strip().split("\n")
    assert lines[0] == "?x\t?y"
    assert lines[1] == '<http://ex/a>\t"v1"@en'
    assert "<boolean>true</boolean>" in to_ask_xml(True)


def test_rdfxml_jsonld_unescape_literals():
    """ADVICE r2: RDF/XML element text and JSON-LD @value must carry the
    REAL lexical value, not the N-Triples-escaped form (Jena parity)."""
    import json as _json
    from morph_xr2rml_spark import rdf_io
    rows = [("<http://ex/s>", "<http://ex/p>",
             '"a\\nb \\"q\\" c\\\\d \\u00e9"')]
    xml = rdf_io.to_rdfxml(rows)
    assert "a\nb" in xml and '"q"' in xml and "c\\d" in xml
    assert "\\n" not in xml.split("<ns0:p")[1]
    doc = _json.loads(rdf_io.to_jsonld(rows))
    val = doc["@graph"][0]["http://ex/p"][0]["@value"]
    assert val == 'a\nb "q" c\\d é'
    # Turtle keeps the escaped syntax (shared with N-Triples)
    assert '\\n' in rdf_io.to_turtle(rows)


def test_turtle_free_floating_list_not_duplicated():
    """ADVICE r2: an unreferenced rdf:List head must not render both as
    '( ... )' subject AND as its explicit first/rest body."""
    from morph_xr2rml_spark import namespaces as NS
    from morph_xr2rml_spark import rdf_io
    rows = [("_:b0", f"<{NS.RDF_FIRST}>", '"a"'),
            ("_:b0", f"<{NS.RDF_REST}>", "_:b1"),
            ("_:b1", f"<{NS.RDF_FIRST}>", '"b"'),
            ("_:b1", f"<{NS.RDF_REST}>", f"<{NS.RDF_NIL}>")]
    t = rdf_io.to_turtle(rows)
    assert t.count('"a"') == 1 and t.count('"b"') == 1
    # subject stays a verbatim bnode label
    assert "_:b0\n" in t
