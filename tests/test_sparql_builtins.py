"""SPARQL 1.1 builtin-function tail (VERDICT r3 item 1): numeric
ABS/CEIL/FLOOR/ROUND, datetime accessors YEAR..SECONDS/TZ, hash
functions, ENCODE_FOR_URI, UUID/STRUUID, NOW, and xsd:TYPE() casts.

The reference gets every one of these free via Jena late evaluation
(MorphMongoQueryProcessor.scala:52-147); here each maps to native
pyspark.sql.functions (whole-stage codegen, no Python in the hot path).
Expected values come from independent Python stdlib implementations
(hashlib, urllib.parse), not the engine.
"""

import hashlib
import re
from urllib.parse import quote

import pytest

from morph_xr2rml_spark.sparql import SparqlEngine

XSD = "http://www.w3.org/2001/XMLSchema#"

ROWS = [
    ("<http://ex/a>", "<http://ex/val>", f'"2.5"^^<{XSD}decimal>'),
    ("<http://ex/b>", "<http://ex/val>", f'"-2.5"^^<{XSD}decimal>'),
    ("<http://ex/c>", "<http://ex/val>", f'"10.3"^^<{XSD}decimal>'),
    ("<http://ex/a>", "<http://ex/when>",
     f'"1996-01-02T03:04:05.25+02:00"^^<{XSD}dateTime>'),
    ("<http://ex/b>", "<http://ex/when>", f'"2020-12-31T23:59:58Z"^^<{XSD}dateTime>'),
    ("<http://ex/c>", "<http://ex/when>", f'"1987-06-05"^^<{XSD}date>'),
    ("<http://ex/a>", "<http://ex/name>", '"Alice Smith"'),
    ("<http://ex/b>", "<http://ex/name>", '"Bob*~.txt"'),
]


@pytest.fixture(scope="module")
def eng(spark):
    df = spark.createDataFrame(ROWS, "subj string, pred string, obj string")
    return SparqlEngine(df.cache())


def rows(eng, text):
    return sorted(tuple(r) for r in eng.sql(text).collect())


def one_col(eng, text):
    return sorted(r[0] for r in eng.sql(text).collect())


# -- numeric ----------------------------------------------------------------

def test_abs_ceil_floor(eng):
    got = rows(eng, """
        SELECT ?s (ABS(?v) AS ?a) (CEIL(?v) AS ?c) (FLOOR(?v) AS ?f)
        WHERE { ?s <http://ex/val> ?v }""")
    by_s = {r[0]: r[1:] for r in got}
    assert by_s["<http://ex/a>"] == (2.5, 3, 2)
    assert by_s["<http://ex/b>"] == (2.5, -2, -3)
    assert by_s["<http://ex/c>"] == (10.3, 11, 10)


def test_round_half_toward_positive_infinity(eng):
    # XPath fn:round: round(2.5)=3 but round(-2.5)=-2 (NOT -3)
    got = rows(eng, """
        SELECT ?s (ROUND(?v) AS ?r) WHERE { ?s <http://ex/val> ?v }""")
    by_s = dict(got)
    assert by_s["<http://ex/a>"] == 3
    assert by_s["<http://ex/b>"] == -2
    assert by_s["<http://ex/c>"] == 10


def test_numop_in_filter(eng):
    got = one_col(eng, """
        SELECT ?s WHERE { ?s <http://ex/val> ?v FILTER(FLOOR(?v) = 2) }""")
    assert got == ["<http://ex/a>"]


# -- datetime accessors -----------------------------------------------------

def test_datetime_accessors(eng):
    got = rows(eng, """
        SELECT ?s (YEAR(?d) AS ?y) (MONTH(?d) AS ?m) (DAY(?d) AS ?dd)
               (HOURS(?d) AS ?h) (MINUTES(?d) AS ?mi) (SECONDS(?d) AS ?sec)
               (TZ(?d) AS ?tz)
        WHERE { ?s <http://ex/when> ?d }""")
    by_s = {r[0]: r[1:] for r in got}
    assert by_s["<http://ex/a>"] == (1996, 1, 2, 3, 4, 5.25, "+02:00")
    assert by_s["<http://ex/b>"] == (2020, 12, 31, 23, 59, 58.0, "Z")
    # xsd:date: time components unbound (None), date parts real
    assert by_s["<http://ex/c>"][:3] == (1987, 6, 5)
    assert by_s["<http://ex/c>"][3:6] == (None, None, None)


def test_year_in_filter(eng):
    got = one_col(eng, """
        SELECT ?s WHERE { ?s <http://ex/when> ?d FILTER(YEAR(?d) >= 1996) }""")
    assert got == ["<http://ex/a>", "<http://ex/b>"]


# -- hashes (vs hashlib, independent) ---------------------------------------

def test_hash_functions(eng):
    got = rows(eng, """
        SELECT ?s (MD5(STR(?n)) AS ?h1) (SHA1(STR(?n)) AS ?h2)
               (SHA256(STR(?n)) AS ?h3) (SHA384(STR(?n)) AS ?h4)
               (SHA512(STR(?n)) AS ?h5)
        WHERE { ?s <http://ex/name> ?n }""")
    by_s = {r[0]: r[1:] for r in got}
    for s, lex in (("<http://ex/a>", "Alice Smith"),
                   ("<http://ex/b>", "Bob*~.txt")):
        b = lex.encode()
        assert by_s[s] == (hashlib.md5(b).hexdigest(),
                           hashlib.sha1(b).hexdigest(),
                           hashlib.sha256(b).hexdigest(),
                           hashlib.sha384(b).hexdigest(),
                           hashlib.sha512(b).hexdigest())


# -- ENCODE_FOR_URI (vs urllib.parse.quote, independent) --------------------

def test_encode_for_uri(eng):
    got = rows(eng, """
        SELECT ?s (ENCODE_FOR_URI(STR(?n)) AS ?e)
        WHERE { ?s <http://ex/name> ?n }""")
    by_s = dict(got)
    # quote(safe="") leaves exactly the RFC 3986 unreserved set, uppercase
    # hex — the ENCODE_FOR_URI contract
    assert by_s["<http://ex/a>"] == quote("Alice Smith", safe="")
    assert by_s["<http://ex/a>"] == "Alice%20Smith"
    assert by_s["<http://ex/b>"] == quote("Bob*~.txt", safe="")
    assert by_s["<http://ex/b>"] == "Bob%2A~.txt"


def test_encode_for_uri_multibyte(spark):
    df = spark.createDataFrame(
        [("<http://ex/u>", "<http://ex/name>", '"héllo wörld"')],
        "subj string, pred string, obj string")
    got = SparqlEngine(df).sql(
        "SELECT (ENCODE_FOR_URI(STR(?n)) AS ?e) "
        "WHERE { ?s <http://ex/name> ?n }").collect()
    assert got[0][0] == quote("héllo wörld", safe="")


# -- UUID / STRUUID / NOW ---------------------------------------------------

def test_uuid_struuid(eng):
    got = rows(eng, """
        SELECT ?s (UUID() AS ?u) (STRUUID() AS ?su)
        WHERE { ?s <http://ex/name> ?n }""")
    uuid_re = r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"
    for _s, u, su in got:
        assert re.fullmatch(f"<urn:uuid:{uuid_re}>", u)
        assert re.fullmatch(uuid_re, su)
    # distinct per row
    assert len({u for _s, u, _su in got}) == len(got)


def test_now(eng):
    got = one_col(eng, "SELECT (NOW() AS ?t) WHERE { ?s <http://ex/name> ?n }")
    for t in got:
        assert re.fullmatch(
            r'"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}"'
            r"\^\^<http://www\.w3\.org/2001/XMLSchema#dateTime>", t)


# -- xsd casts --------------------------------------------------------------

def test_xsd_integer_cast(eng):
    got = rows(eng, f"""
        PREFIX xsd: <{XSD}>
        SELECT ?s (xsd:integer(?v) AS ?i) WHERE {{ ?s <http://ex/val> ?v }}""")
    by_s = dict(got)
    assert by_s["<http://ex/a>"] == f'"2"^^<{XSD}integer>'
    assert by_s["<http://ex/b>"] == f'"-2"^^<{XSD}integer>'
    assert by_s["<http://ex/c>"] == f'"10"^^<{XSD}integer>'


def test_xsd_string_and_boolean_cast(spark):
    df = spark.createDataFrame(
        [("<http://ex/x>", "<http://ex/flag>", f'"1"^^<{XSD}integer>')],
        "subj string, pred string, obj string")
    eng = SparqlEngine(df)
    got = eng.sql(f"""
        PREFIX xsd: <{XSD}>
        SELECT (xsd:string(?v) AS ?s) (xsd:boolean(?v) AS ?b)
               (xsd:double(?v) AS ?d)
        WHERE {{ ?x <http://ex/flag> ?v }}""").collect()[0]
    assert got["s"] == '"1"'
    assert got["b"] == f'"true"^^<{XSD}boolean>'
    assert got["d"] == f'"1.0"^^<{XSD}double>'


def test_xsd_cast_in_filter(eng):
    # cast result participates in numeric comparison via lexical extraction
    got = one_col(eng, f"""
        PREFIX xsd: <{XSD}>
        SELECT ?s WHERE {{ ?s <http://ex/val> ?v
                           FILTER(xsd:integer(?v) = 10) }}""")
    assert got == ["<http://ex/c>"]


def test_full_iri_cast_form(eng):
    got = rows(eng, f"""
        SELECT ?s (<{XSD}integer>(?v) AS ?i) WHERE {{ ?s <http://ex/val> ?v }}""")
    assert dict(got)["<http://ex/c>"] == f'"10"^^<{XSD}integer>'


# -- typed / lang-tagged literals in FILTER expressions (round 4) -----------

def test_datetime_range_filter(eng):
    got = one_col(eng, f"""
        PREFIX xsd: <{XSD}>
        SELECT ?s WHERE {{
            ?s <http://ex/when> ?d
            FILTER(?d >= "1996-01-01T00:00:00"^^xsd:dateTime)
        }}""")
    assert got == ["<http://ex/a>", "<http://ex/b>"]


def test_date_literal_filter(eng):
    got = one_col(eng, f"""
        PREFIX xsd: <{XSD}>
        SELECT ?s WHERE {{
            ?s <http://ex/when> ?d
            FILTER(?d < "1990-01-01"^^xsd:date)
        }}""")
    assert got == ["<http://ex/c>"]


def test_numeric_typed_literal_compares_by_value(eng):
    # "2"^^xsd:integer must compare numerically (2.5 > 2), not lexically
    got = one_col(eng, f"""
        PREFIX xsd: <{XSD}>
        SELECT ?s WHERE {{
            ?s <http://ex/val> ?v FILTER(?v > "2"^^xsd:integer)
        }}""")
    assert got == ["<http://ex/a>", "<http://ex/c>"]


def test_lang_tagged_literal_term_equality(spark):
    from morph_xr2rml_spark.sparql import SparqlEngine
    rows = [("<http://ex/a>", "<http://ex/label>", '"chair"@en'),
            ("<http://ex/b>", "<http://ex/label>", '"chair"@fr'),
            ("<http://ex/c>", "<http://ex/label>", '"chair"')]
    eng2 = SparqlEngine(spark.createDataFrame(
        rows, "subj string, pred string, obj string"))
    got = sorted(r[0] for r in eng2.sql("""
        SELECT ?s WHERE { ?s <http://ex/label> ?l
                          FILTER(?l = "chair"@en) }""").collect())
    assert got == ["<http://ex/a>"]


def test_typed_literal_in_list(eng):
    got = one_col(eng, f"""
        PREFIX xsd: <{XSD}>
        SELECT ?s WHERE {{
            ?s <http://ex/when> ?d
            FILTER(?d IN ("1987-06-05"^^xsd:date, "2001-01-01"^^xsd:date))
        }}""")
    assert got == ["<http://ex/c>"]


def test_timezone_builtin(spark):
    """TIMEZONE (§17.4.5.7): the zone as an xsd:dayTimeDuration term —
    the spec's own examples; no timezone → error (unbound)."""
    from morph_xr2rml_spark.sparql import SparqlEngine
    XD = "^^<http://www.w3.org/2001/XMLSchema#dateTime>"
    df = spark.createDataFrame(
        [("<a>", "<p>", f'"2011-01-10T14:45:13.815-05:00"{XD}', None),
         ("<b>", "<p>", f'"2011-01-10T14:45:13Z"{XD}', None),
         ("<c>", "<p>", f'"2011-01-10T14:45:13+05:30"{XD}', None),
         ("<d>", "<p>", f'"2011-01-10T14:45:13"{XD}', None)],
        "subj string, pred string, obj string, graph string")
    out = SparqlEngine(df).sql(
        "SELECT ?s (TIMEZONE(?x) AS ?tz) WHERE { ?s <p> ?x } ORDER BY ?s")
    dt = "^^<http://www.w3.org/2001/XMLSchema#dayTimeDuration>"
    assert [tuple(r) for r in out.collect()] == [
        ("<a>", f'"-PT5H"{dt}'), ("<b>", f'"PT0S"{dt}'),
        ("<c>", f'"PT5H30M"{dt}'), ("<d>", None)]
