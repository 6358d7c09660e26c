"""RDB-star fixture (FIXTURES.md §4): the reference's example_mysql mapping —
mixed-syntax paths (Column/XPath, Column/JSONPath, CSV cells), column
equi-joins, mixed-path joins (the case the reference handles with a SQL
cartesian product + post-filter, MorphRDBUnfolder.scala:435-439, and we
handle with explode + equi-join), NULL columns, rr:sqlQuery sources,
iterator-ignored-on-Column-formulation."""

import pytest

from morph_xr2rml_spark.local_engine import materialize_local
from morph_xr2rml_spark.model import MappingDocument

from conftest import requires_reference

pytestmark = requires_reference

MAPPING = "/root/reference/morph-xr2rml-dist/example_mysql/mapping.ttl"
EX = "http://example.com/"

# rows mirror example_mysql/testdb_dump.sql:31-38,63-67 (None keys omitted —
# JSON row docs drop NULL columns, matching Spark's to_json)
_XML = {
    "B1": '<?xml version="1.0"?>\n<FullName>\n<FirstNames><FirstName>Paul'
          '</FirstName><FirstName>Jack</FirstName></FirstNames>\n'
          '<LastName>Smith</LastName>\n</FullName>',
    "B2": '<FullName>\n<FirstNames><FirstName>John</FirstName><FirstName>'
          'Fitzgerald</FirstName></FirstNames>\n<LastName>Kennedy</LastName>'
          '\n</FullName>\n',
    "B3": '<FullName>\n<FirstNames><FirstName>Mike</FirstName></FirstNames>'
          '\n<LastName>Peterson</LastName>\n</FullName>\n',
}

STUDENTS = [
    {"id": "B1", "comments": '[{"hobby": "Swimming","place": "sea"},'
                             '{"hobby": "Soccer","place": "street"}]',
     "name": _XML["B1"], "sport": 0},
    {"id": "B2", "comments": '[{"hobby": "Hiking","place": "Mountain"},'
                             '{"hobby": "Basketball","place": "street"},'
                             '{"sportInClub": [100, 200, 300]}]',
     "name": _XML["B2"], "sport": 100, "email": "john@acd.edu"},
    {"id": "B3", "comments": "", "name": _XML["B3"],
     "webpage": "www.george.edu"},
    {"id": "B4", "comments": '[{"sportInClub": [400, 500, 600]}]',
     "sport": 600, "webpage": "www.starr.edu", "email": "ringo@acd.edu"},
]

SPORTS = [
    {"id": 0, "name": "BasketBall", "code": "B, BSK, BK",
     "shirt_colors": '{"color1": "black","color2": "grey"}'},
    {"id": 100, "name": "Tennis", "code": "T, TN,TNS",
     "shirt_colors": ' ["blue", "red", "brown"]'},
    {"id": 200, "name": "Chess", "code": "CHS",
     "shirt_colors": ' {"color": "yellow"}'},
    {"id": 300, "name": "Scuba diving", "code": "SCB,DIV"},
    {"id": 400, "name": "Free diving", "code": "FD,APNEA"},
    {"id": 500, "name": "Pool", "code": "P,PL,POO",
     "shirt_colors": '{"color": "grey", "color": "orange"}'},
    {"id": 600, "name": "Soccer", "code": "SOC,SC"},
]


def _local():
    mapping = MappingDocument.from_file(MAPPING)
    return materialize_local(mapping, {"student": STUDENTS, "sport": SPORTS})


def _spo(triples):
    return {(s, p, o) for (s, p, o, g) in triples}


def test_subject_mixed_xpath_template():
    spo = _spo(_local())
    for subj in ("B1-Smith", "B2-Kennedy", "B3-Peterson", "B4-"):
        assert any(s == f"<http://example.org/student/{subj}>"
                   for (s, p, o) in spo), subj


def test_hobbies_column_jsonpath():
    spo = _spo(_local())
    b1 = "<http://example.org/student/B1-Smith>"
    hobbies = {o for (s, p, o) in spo if s == b1 and p == f"<{EX}hobbies>"}
    assert hobbies == {'"Swimming"', '"Soccer"'}
    b3 = "<http://example.org/student/B3-Peterson>"
    assert not any(s == b3 and p == f"<{EX}hobbies>" for (s, p, o) in spo)


def test_csv_cell():
    spo = _spo(_local())
    codes = {(s, o) for (s, p, o) in spo if p == f"<{EX}code1>"}
    assert ("<http://example.org/sport/100-Tennis>", '"TN"') in codes
    assert ("<http://example.org/sport/300-Scuba%20diving>", '"DIV"') in codes
    # single-cell code has no index 1
    assert not any(s == "<http://example.org/sport/200-Chess>"
                   for (s, o) in codes)


def test_column_equi_join():
    spo = _spo(_local())
    main = {(s, o) for (s, p, o) in spo if p == f"<{EX}mainSport>"}
    assert ("<http://example.org/student/B1-Smith>",
            "<http://example.org/sport/0-BasketBall>") in main
    assert ("<http://example.org/student/B4->",
            "<http://example.org/sport/600-Soccer>") in main
    # B3 has NULL sport → no triple
    assert not any(s == "<http://example.org/student/B3-Peterson>"
                   for (s, o) in main)


def test_mixed_path_join_child_side():
    spo = _spo(_local())
    club = {(s, o) for (s, p, o) in spo if p == f"<{EX}practiceInClub>"}
    b2 = "<http://example.org/student/B2-Kennedy>"
    assert {(s, o) for (s, o) in club if s == b2} == {
        (b2, "<http://example.org/sport/100-Tennis>"),
        (b2, "<http://example.org/sport/200-Chess>"),
        (b2, "<http://example.org/sport/300-Scuba%20diving>")}


def test_mixed_path_join_parent_side():
    spo = _spo(_local())
    by = {(s, o) for (s, p, o) in spo if p == f"<{EX}practicedBy>"}
    assert ("<http://example.org/sport/500-Pool>",
            "<http://example.org/student/B4->") in by
    assert ("<http://example.org/sport/100-Tennis>",
            "<http://example.org/student/B2-Kennedy>") in by


def test_colors_rdflist_and_null_column():
    triples = _local()
    spo3 = {}
    for (s, p, o, g) in triples:
        spo3.setdefault(s, {}).setdefault(p, o)
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

    def members(head):
        out, node = [], head
        while node != f"<{RDF}nil>":
            out.append(spo3[node][f"<{RDF}first>"])
            node = spo3[node][f"<{RDF}rest>"]
        return out

    tennis = spo3["<http://example.org/sport/100-Tennis>"][f"<{EX}colors>"]
    assert members(tennis) == ['"blue"', '"red"', '"brown"']
    # duplicate JSON key: last wins (JSON object semantics)
    pool = spo3["<http://example.org/sport/500-Pool>"][f"<{EX}colors>"]
    assert members(pool) == ['"orange"']
    # NULL shirt_colors → no colors triple at all
    assert f"<{EX}colors>" not in spo3.get(
        "<http://example.org/sport/300-Scuba%20diving>", {})


def test_spark_parity_rdb_star(spark):
    from morph_xr2rml_spark.engine import materialize
    from morph_xr2rml_spark.sources import SourceCatalog
    student_df = spark.createDataFrame(
        [(r["id"], r["comments"], r.get("name"), r.get("sport"),
          r.get("webpage"), r.get("email")) for r in STUDENTS],
        "id string, comments string, name string, sport long, "
        "webpage string, email string")
    sport_df = spark.createDataFrame(
        [(r["id"], r["name"], r["code"], r.get("shirt_colors"))
         for r in SPORTS],
        "id long, name string, code string, shirt_colors string")
    cat = (SourceCatalog()
           .register_table("student", student_df)
           .register_table("sport", sport_df))
    mapping = MappingDocument.from_file(MAPPING)
    got = {tuple(r) for r in materialize(spark, mapping, cat).collect()}
    want = _local()
    assert got == want


def test_mysql_rewriting_example_query(spark):
    """example_mysql_rewriting end-to-end: the reference's mapping (with
    rr:sqlQuery parent source) materialized through Spark, then its
    query.sparql shape answered over the result — reference: SPARQL→SQL
    rewriting; here: materialize-then-query.  Hobbies come from the
    JSONPath reference over the comments column."""
    from morph_xr2rml_spark.engine import materialize
    from morph_xr2rml_spark.sources import SourceCatalog
    from morph_xr2rml_spark.sparql import SparqlEngine

    # NOTE: the reference's shipped mapping has a DANGLING
    # rr:parentTriplesMap <#Sport> (the TM is named <#TMSport>) — its
    # query translator only resolves POMs a query needs, so the broken
    # reference goes unnoticed there; a materializer must resolve every
    # POM, so fix the name before loading.
    text = open(
        "/root/reference/morph-xr2rml-dist/example_mysql_rewriting/"
        "mapping.ttl").read().replace("<#Sport>", "<#TMSport>")
    mapping = MappingDocument.from_text(text)
    cat = SourceCatalog()
    cat.register_table("student", spark.createDataFrame(
        [(d.get("id"), d.get("comments"), d.get("name"), d.get("sport"),
          d.get("webpage"), d.get("email")) for d in STUDENTS],
        "id string, comments string, name string, sport long, "
        "webpage string, email string"))
    cat.register_table("sport", spark.createDataFrame(
        [(d.get("id"), d.get("name"), d.get("code"), d.get("shirt_colors"))
         for d in SPORTS],
        "id long, name string, code string, shirt_colors string"))
    triples = materialize(spark, mapping, cat)
    eng = SparqlEngine(triples.cache())
    rows = eng.sql("""
        PREFIX ex: <http://example.com/>
        SELECT ?s ?h WHERE { ?s a ex:Student ; ex:hobbies ?h . }
        """).collect()
    got = {(r.s, r.h) for r in rows}
    # THIS mapping's ex:hobbies is a plain Column reference ("comments"),
    # so the term is the raw column string (unlike example_mysql's
    # mixed-syntax JSONPath extraction); subjects are student/{id}
    subjects = {s for s, _h in got}
    assert subjects == {f"<http://example.org/student/B{i}>"
                        for i in (1, 2, 3, 4)}
    b1 = [h for s, h in got if s.endswith("/B1>")]
    assert len(b1) == 1 and "Swimming" in b1[0] and "Soccer" in b1[0]
