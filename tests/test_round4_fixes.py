"""Round-4 ADVICE fixes:
- EXISTS/NOT EXISTS/MINUS compatibility semantics for UNBOUND (NULL)
  shared variables on the outer side (substitution semantics: an unbound
  variable is compatible with any inner binding);
- SELECT expressions whose alias is not a GROUP BY key in aggregate
  queries (used to be silently dropped);
- SELECT * no longer swallows user variables like ?_c1 / ?_price
  (internal columns now use the '#' prefix the VAR token cannot produce);
- mongo-shell filter normalization leaves quoted string values alone;
- endpoint truncation is signaled, not silent.
"""

import json
import urllib.request

import pytest

from morph_xr2rml_spark.mongo_filter import parse_filter
from morph_xr2rml_spark.sparql import SparqlEngine

ROWS = [
    ("<http://ex/a>", "<http://ex/name>", '"Alice"'),
    ("<http://ex/b>", "<http://ex/name>", '"Bob"'),
    ("<http://ex/c>", "<http://ex/name>", '"Carol"'),
    ("<http://ex/a>", "<http://ex/knows>", "<http://ex/b>"),
    ("<http://ex/b>", "<http://ex/likes>", "<http://ex/z>"),
]


@pytest.fixture(scope="module")
def eng(spark):
    df = spark.createDataFrame(ROWS, "subj string, pred string, obj string")
    return SparqlEngine(df.cache())


def q(eng, text):
    return sorted(tuple(r) for r in eng.sql(text).collect())


# -- EXISTS with an unbound shared variable ---------------------------------

def test_exists_unbound_outer_var_is_wildcard(eng):
    # ?k is NULL for b and c (no knows edge).  Substitution semantics: an
    # unbound ?k is compatible with any inner binding, so EXISTS succeeds
    # for them because the inner pattern is non-empty.
    got = q(eng, """
        SELECT ?s WHERE {
            ?s <http://ex/name> ?n
            OPTIONAL { ?s <http://ex/knows> ?k }
            FILTER EXISTS { ?k <http://ex/name> ?nm }
        }""")
    assert got == [("<http://ex/a>",), ("<http://ex/b>",),
                   ("<http://ex/c>",)]


def test_not_exists_unbound_outer_var(eng):
    # NOT EXISTS is the complement: rows with unbound ?k fail it (the
    # inner pattern matches something), a's bound ?k=b has a name → fails
    # too; nothing survives
    got = q(eng, """
        SELECT ?s WHERE {
            ?s <http://ex/name> ?n
            OPTIONAL { ?s <http://ex/knows> ?k }
            FILTER NOT EXISTS { ?k <http://ex/name> ?nm }
        }""")
    assert got == []


def test_exists_bound_semantics_unchanged(eng):
    # all-bound rows still behave as a plain semi join
    got = q(eng, """
        SELECT ?s WHERE {
            ?s <http://ex/knows> ?k
            FILTER EXISTS { ?k <http://ex/name> ?nm }
        }""")
    assert got == [("<http://ex/a>",)]


def test_exists_marker_unbound_outer_var(eng):
    # EXISTS inside a compound boolean: same wildcard rule via markers
    got = q(eng, """
        SELECT ?s WHERE {
            ?s <http://ex/name> ?n
            OPTIONAL { ?s <http://ex/knows> ?k }
            FILTER(EXISTS { ?k <http://ex/name> ?nm } && ?n != "Carol")
        }""")
    assert got == [("<http://ex/a>",), ("<http://ex/b>",)]


def test_minus_null_shared_var_wildcard(eng):
    # MINUS shares ?s and ?k.  Outer (b, NULL): inner { b likes z } is
    # compatible (s equal, k unbound = wildcard) with dom overlap on ?s →
    # b is removed.  a and c have no compatible inner row → stay.
    got = q(eng, """
        SELECT ?s WHERE {
            ?s <http://ex/name> ?n
            OPTIONAL { ?s <http://ex/knows> ?k }
            MINUS { ?s <http://ex/likes> ?k }
        }""")
    assert got == [("<http://ex/a>",), ("<http://ex/c>",)]


def test_minus_all_shared_unbound_keeps_row(eng):
    # a MINUS whose only shared var is unbound in the outer row: domains
    # are disjoint for that solution → it stays (§8.3.3)
    got = q(eng, """
        SELECT ?s WHERE {
            ?s <http://ex/name> ?n
            OPTIONAL { ?s <http://ex/knows> ?k }
            MINUS { <http://ex/b> <http://ex/likes> ?k }
        }""")
    # a's ?k = <b> ≠ <z> → stays; b/c have ?k unbound → stay
    assert got == [("<http://ex/a>",), ("<http://ex/b>",),
                   ("<http://ex/c>",)]


# -- SELECT expressions in aggregate queries --------------------------------

def test_select_expr_over_group_key_with_aggregates(eng):
    got = q(eng, """
        SELECT (UCASE(?n) AS ?u) (COUNT(?s) AS ?c) WHERE {
            ?s <http://ex/name> ?n
        } GROUP BY ?n ORDER BY ?u""")
    # the expression column is present (leading, SELECT order), not
    # silently dropped
    assert [r[:2] for r in got] == [("ALICE", 1), ("BOB", 1), ("CAROL", 1)]


def test_select_expr_over_aggregate_alias(eng):
    got = q(eng, """
        SELECT (COUNT(?s) AS ?c) (?c + 1 AS ?cpp) WHERE {
            ?s <http://ex/name> ?n
        }""")
    assert got == [(3, 4.0)]


# -- SELECT * with underscore-named user variables --------------------------

def test_select_star_keeps_underscore_user_vars(eng):
    got = eng.sql("SELECT * WHERE { ?_c1 <http://ex/knows> ?_price }")
    assert sorted(got.columns) == ["_c1", "_price"]
    assert got.collect()[0]["_c1"] == "<http://ex/a>"


def test_select_star_still_hides_bnode_vars(eng):
    got = eng.sql("SELECT * WHERE { _:x <http://ex/knows> ?o }")
    assert got.columns == ["o"]


# -- mongo filter normalization ---------------------------------------------

def test_filter_colon_slash_inside_quoted_value():
    assert parse_filter("{note: 'see: /tmp/x'}") == {"note": "see: /tmp/x"}
    assert parse_filter('{note: "see: /tmp/x"}') == {"note": "see: /tmp/x"}


def test_filter_colon_comma_inside_quoted_value():
    assert parse_filter('{note: "a, b: c", k: 1}') == \
        {"note": "a, b: c", "k": 1}


def test_filter_shell_regex_still_rewrites():
    assert parse_filter("{f: /ab/i}") == \
        {"f": {"$regex": "ab", "$options": "i"}}
    assert parse_filter("{f: /ab/}") == {"f": {"$regex": "ab"}}


# -- endpoint truncation signal ---------------------------------------------

def test_endpoint_truncation_header(spark):
    from morph_xr2rml_spark.endpoint import SparqlEndpoint
    df = spark.createDataFrame(ROWS, "subj string, pred string, obj string")
    ep = SparqlEndpoint(SparqlEngine(df), max_result_rows=2).start()
    try:
        url = ep.url + "?query=" + urllib.request.quote(
            "SELECT ?s ?n WHERE { ?s <http://ex/name> ?n }")
        with urllib.request.urlopen(url) as r:
            assert r.headers.get("X-Sparql-Results-Truncated") == "true"
            body = json.loads(r.read())
        assert len(body["results"]["bindings"]) == 2
        # uncapped query: no header
        url = ep.url + "?query=" + urllib.request.quote(
            "SELECT ?s WHERE { ?s <http://ex/knows> ?o }")
        with urllib.request.urlopen(url) as r:
            assert r.headers.get("X-Sparql-Results-Truncated") is None
            body = json.loads(r.read())
        assert len(body["results"]["bindings"]) == 1
    finally:
        ep.stop()
