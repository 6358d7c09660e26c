"""Round-3 SPARQL surface tail (VERDICT r2 item 2): object lists, MINUS,
FILTER (NOT) EXISTS, string functions, isBlank/sameTerm, ORDER BY
expressions, blank-node syntax in patterns.

The reference gets all of these free via Jena late evaluation
(MorphMongoQueryProcessor.scala:52-147); here each is a DataFrame algebra
shape (anti/semi joins, Column string functions).
"""

import pytest

from morph_xr2rml_spark.sparql import SparqlEngine, parse_sparql

XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

ROWS = [
    ("<http://ex/a>", "<http://ex/name>", '"Alice"'),
    ("<http://ex/b>", "<http://ex/name>", '"Bob"'),
    ("<http://ex/c>", "<http://ex/name>", '"Carol"'),
    ("<http://ex/a>", "<http://ex/knows>", "<http://ex/b>"),
    ("<http://ex/a>", "<http://ex/age>", f'"30"^^<{XSD_INT}>'),
    ("<http://ex/b>", "<http://ex/age>", f'"25"^^<{XSD_INT}>'),
    ("_:bn1", "<http://ex/name>", '"Anon"'),
]


@pytest.fixture(scope="module")
def eng(spark):
    df = spark.createDataFrame(ROWS, "subj string, pred string, obj string")
    return SparqlEngine(df.cache())


def q(eng, text):
    return sorted(tuple(r) for r in eng.sql(text).collect())


def test_object_list(eng):
    got = q(eng, "SELECT ?o WHERE "
                 "{ <http://ex/a> <http://ex/knows> ?o , <http://ex/b> }")
    assert got == [("<http://ex/b>",)]


def test_minus(eng):
    got = q(eng, "SELECT ?s WHERE { ?s <http://ex/name> ?n "
                 "MINUS { ?s <http://ex/knows> ?x } }")
    assert ("<http://ex/a>",) not in got
    assert ("<http://ex/b>",) in got and len(got) == 3


def test_minus_disjoint_removes_nothing(eng):
    # MINUS with no shared variables removes nothing (SPARQL 1.1 §8.3.3)
    got = q(eng, "SELECT ?s WHERE { ?s <http://ex/name> ?n "
                 "MINUS { ?x <http://ex/knows> ?y } }")
    assert len(got) == 4


def test_filter_not_exists(eng):
    got = q(eng, "SELECT ?s WHERE { ?s <http://ex/name> ?n "
                 "FILTER NOT EXISTS { ?s <http://ex/knows> ?x } }")
    assert ("<http://ex/a>",) not in got and len(got) == 3
    # parenthesized form
    got2 = q(eng, "SELECT ?s WHERE { ?s <http://ex/name> ?n "
                  "FILTER (NOT EXISTS { ?s <http://ex/knows> ?x }) }")
    assert got2 == got


def test_filter_exists(eng):
    got = q(eng, "SELECT ?s WHERE { ?s <http://ex/name> ?n "
                 "FILTER EXISTS { ?s <http://ex/age> ?a } }")
    assert got == [("<http://ex/a>",), ("<http://ex/b>",)]


def test_exists_no_shared_vars_is_constant(eng):
    got = q(eng, "SELECT ?s WHERE { ?s <http://ex/name> ?n "
                 "FILTER EXISTS { ?x <http://ex/knows> ?y } }")
    assert len(got) == 4
    got = q(eng, "SELECT ?s WHERE { ?s <http://ex/name> ?n "
                 "FILTER NOT EXISTS { ?x <http://ex/knows> ?y } }")
    assert got == []


def test_string_functions(eng):
    assert q(eng, 'SELECT ?n WHERE { ?s <http://ex/name> ?n '
                  'FILTER STRSTARTS(STR(?n), "A") }') == \
        [('"Alice"',), ('"Anon"',)]
    assert q(eng, 'SELECT ?n WHERE { ?s <http://ex/name> ?n '
                  'FILTER STRENDS(?n, "rol") }') == [('"Carol"',)]
    assert q(eng, 'SELECT ?n WHERE { ?s <http://ex/name> ?n '
                  'FILTER CONTAINS(?n, "aro") }') == [('"Carol"',)]
    assert q(eng, 'SELECT ?n WHERE { ?s <http://ex/name> ?n '
                  'FILTER (UCASE(?n) = "BOB") }') == [('"Bob"',)]
    assert q(eng, 'SELECT ?n WHERE { ?s <http://ex/name> ?n '
                  'FILTER (LCASE(?n) = "carol") }') == [('"Carol"',)]
    assert q(eng, 'SELECT ?n WHERE { ?s <http://ex/name> ?n '
                  'FILTER (SUBSTR(?n, 1, 3) = "Car") }') == [('"Carol"',)]
    assert q(eng, 'SELECT ?n WHERE { ?s <http://ex/name> ?n '
                  'FILTER (STRLEN(?n) = 3) }') == [('"Bob"',)]


def test_strbefore_strafter_replace(eng):
    got = q(eng, 'SELECT ?x WHERE { ?s <http://ex/name> ?n '
                 'BIND(STRAFTER(STR(?n), "li") AS ?x) FILTER(?x = "ce") }')
    assert got == [("ce",)]
    got = q(eng, 'SELECT ?x WHERE { ?s <http://ex/name> ?n '
                 'BIND(STRBEFORE(STR(?n), "ob") AS ?x) FILTER(?x = "B") }')
    assert got == [("B",)]
    got = q(eng, 'SELECT ?x WHERE { ?s <http://ex/name> ?n '
                 'BIND(REPLACE(STR(?n), "o", "0") AS ?x) '
                 'FILTER(?x = "B0b") }')
    assert got == [("B0b",)]


def test_isblank_sameterm(eng):
    assert q(eng, "SELECT ?n WHERE { ?s <http://ex/name> ?n "
                  "FILTER isBlank(?s) }") == [('"Anon"',)]
    assert q(eng, "SELECT ?n WHERE { ?s <http://ex/name> ?n "
                  "FILTER sameTerm(?s, <http://ex/a>) }") == [('"Alice"',)]


def test_blank_node_patterns(eng):
    # labeled bnode joins across patterns, hidden from SELECT *
    got = q(eng, "SELECT ?n WHERE { _:x <http://ex/name> ?n . "
                 "_:x <http://ex/age> ?a FILTER(?a > 26) }")
    assert got == [('"Alice"',)]
    star = eng.sql("SELECT * WHERE { _:x <http://ex/name> ?n }")
    assert star.columns == ["n"]
    # [ p o ; p o ] property list
    got = q(eng, "SELECT ?n WHERE { [ <http://ex/name> ?n ; "
                 "<http://ex/age> ?a ] FILTER(?a < 26) }")
    assert got == [('"Bob"',)]
    # [] anonymous subject
    got = q(eng, 'SELECT ?n WHERE { [] <http://ex/name> ?n '
                 'FILTER CONTAINS(?n, "non") }')
    assert got == [('"Anon"',)]


def test_order_by_expression(eng):
    got = [r[0] for r in eng.sql(
        "SELECT ?n WHERE { ?s <http://ex/name> ?n } "
        "ORDER BY DESC(STRLEN(?n))").collect()]
    assert got[0] == '"Alice"'
    got = [r[0] for r in eng.sql(
        "SELECT ?n WHERE { ?s <http://ex/name> ?n } "
        "ORDER BY STRLEN(?n)").collect()]
    assert got[0] == '"Bob"'


def test_parse_errors_still_raise():
    with pytest.raises(ValueError):
        parse_sparql("SELECT ?x WHERE { ?x }")
    with pytest.raises(ValueError):
        parse_sparql("SELECT ?x WHERE { ?x <p> ?y FILTER BOGUSFN(?y) }")


def test_having(eng):
    # segments with more than one member; COUNT referenced only in HAVING
    got = q(eng, "SELECT ?s (COUNT(?x) AS ?n) WHERE "
                 "{ ?x <http://ex/name> ?s } GROUP BY ?s "
                 "HAVING (COUNT(?x) >= 1) ORDER BY ?s")
    assert len(got) == 4
    got = q(eng, "SELECT ?o (COUNT(?s) AS ?n) WHERE { ?s ?p ?o } "
                 "GROUP BY ?o HAVING (COUNT(?s) > 1)")
    assert got == []  # every object unique in the fixture... verify below
    # aggregate alias form
    got = q(eng, "SELECT ?p (COUNT(?s) AS ?n) WHERE { ?s ?p ?o } "
                 "GROUP BY ?p HAVING (?n >= 2) ORDER BY ?p")
    preds = [r[0] for r in got]
    assert "<http://ex/name>" in preds and "<http://ex/age>" in preds
    assert "<http://ex/knows>" not in preds


def test_group_concat_and_sample(eng):
    got = q(eng, 'SELECT ?p (GROUP_CONCAT(?n; SEPARATOR="|") AS ?all) '
                 "WHERE { ?s ?p ?n FILTER isLiteral(?n) "
                 "FILTER(?p = <http://ex/name>) } GROUP BY ?p")
    assert got == [("<http://ex/name>", "Alice|Anon|Bob|Carol")]
    got = q(eng, "SELECT (SAMPLE(?n) AS ?one) WHERE "
                 "{ ?s <http://ex/name> ?n }")
    assert len(got) == 1 and got[0][0] == '"Alice"'  # deterministic min


def test_coalesce_and_if(eng):
    got = q(eng, "SELECT ?s ?v WHERE { ?s <http://ex/name> ?n "
                 "OPTIONAL { ?s <http://ex/age> ?a } "
                 'BIND(COALESCE(?a, "none") AS ?v) '
                 "FILTER(?v = \"none\") }")
    assert len(got) == 2   # carol + anon have no age
    got = q(eng, "SELECT ?n ?f WHERE { ?s <http://ex/name> ?n . "
                 "?s <http://ex/age> ?a "
                 'BIND(IF(?a > 26, "old", "young") AS ?f) } ORDER BY ?n')
    assert got == sorted([('"Alice"', "old"), ('"Bob"', "young")])


def test_values_undef(eng):
    # multi-var VALUES with UNDEF as wildcard on a shared var
    got = q(eng, "SELECT ?s ?n WHERE { ?s <http://ex/name> ?n "
                 "VALUES (?s ?n) { (<http://ex/a> UNDEF) "
                 '(UNDEF "Bob") } } ORDER BY ?s')
    assert got == [("<http://ex/a>", '"Alice"'), ("<http://ex/b>", '"Bob"')]
    # single-var VALUES containing UNDEF constrains nothing
    got = q(eng, "SELECT ?n WHERE { ?s <http://ex/name> ?n "
                 'VALUES ?n { "Bob" UNDEF } }')
    assert len(got) == 4


def test_negated_property_set(eng):
    # a's triples: name "Alice", knows b, age 30 → !knows keeps 2
    got = q(eng, "SELECT ?o WHERE "
                 "{ <http://ex/a> !<http://ex/knows> ?o }")
    assert ("<http://ex/b>",) not in got and len(got) == 2
    got = q(eng, "SELECT ?o WHERE { <http://ex/a> "
                 "!(<http://ex/knows>|<http://ex/age>) ?o }")
    assert got == [('"Alice"',)]


def test_construct_where_shorthand(eng):
    got = sorted(map(tuple, eng.construct(
        "CONSTRUCT WHERE { ?s <http://ex/knows> ?o }").collect()))
    assert got == [("<http://ex/a>", "<http://ex/knows>", "<http://ex/b>")]


def test_aggregate_results_serialize(eng):
    """COUNT produces a long column — the JSON/XML serializers must
    handle non-string binding values (regression: .startswith on int)."""
    from morph_xr2rml_spark.sparql import to_sparql_json, to_sparql_xml
    df = eng.sql("SELECT ?p (COUNT(?s) AS ?n) WHERE { ?s ?p ?o } "
                 "GROUP BY ?p ORDER BY ?p")
    doc = to_sparql_json(df)
    assert all(b["n"]["value"].isdigit()
               for b in doc["results"]["bindings"])
    assert "<literal>" in to_sparql_xml(df)


def test_exists_partition_invariant(spark):
    """Algebraic invariant on random graphs: FILTER EXISTS and FILTER
    NOT EXISTS partition the base solution set."""
    import random
    rnd = random.Random(42)
    rows = [(f"<http://ex/n{rnd.randrange(12)}>",
             f"<http://ex/p{rnd.randrange(3)}>",
             f"<http://ex/n{rnd.randrange(12)}>") for _ in range(60)]
    df = spark.createDataFrame(sorted(set(rows)),
                               "subj string, pred string, obj string")
    e2 = SparqlEngine(df)
    base = "SELECT ?s WHERE { ?s <http://ex/p0> ?o %s }"
    n_base = e2.sql(base % "").count()
    n_ex = e2.sql(base % "FILTER EXISTS { ?s <http://ex/p1> ?x }").count()
    n_nex = e2.sql(base %
                   "FILTER NOT EXISTS { ?s <http://ex/p1> ?x }").count()
    assert n_ex + n_nex == n_base
    # MINUS agrees with NOT EXISTS when the shared var is always bound
    n_minus = e2.sql(base % "MINUS { ?s <http://ex/p1> ?x }").count()
    assert n_minus == n_nex


def test_parenthesized_path_groups(eng):
    # (knows/name) sequence in a group, then + on a group
    got = q(eng, "SELECT ?n WHERE "
                 "{ <http://ex/a> (<http://ex/knows>/<http://ex/name>) ?n }")
    assert got == [('"Bob"',)]
    got = q(eng, "SELECT ?o WHERE "
                 "{ <http://ex/a> (<http://ex/knows>)+ ?o }")
    assert got == [("<http://ex/b>",)]
    # inverse of a group
    got = q(eng, "SELECT ?s WHERE "
                 "{ <http://ex/b> ^(<http://ex/knows>) ?s }")
    assert got == [("<http://ex/a>",)]
    # alternation group with modifier parses and evaluates
    got = q(eng, "SELECT ?o WHERE { <http://ex/a> "
                 "(<http://ex/knows>|<http://ex/age>)+ ?o }")
    assert ("<http://ex/b>",) in got


def test_arithmetic_in_filters(eng):
    got = q(eng, "SELECT ?n WHERE { ?s <http://ex/name> ?n . "
                 "?s <http://ex/age> ?a FILTER(?a + 5 > 32) }")
    assert got == [('"Alice"',)]
    got = q(eng, "SELECT ?n WHERE { ?s <http://ex/name> ?n . "
                 "?s <http://ex/age> ?a FILTER(?a * 2 = 50) }")
    assert got == [('"Bob"',)]
    got = q(eng, "SELECT ?n WHERE { ?s <http://ex/name> ?n . "
                 "?s <http://ex/age> ?a FILTER(35 - ?a >= 10) }")
    assert got == [('"Bob"',)]


def test_default_empty_prefix(spark):
    """PREFIX : <...> — the default prefix a migrating user's first
    query very often uses."""
    df = spark.createDataFrame(ROWS, "subj string, pred string, obj string")
    e2 = SparqlEngine(df)
    got = sorted(tuple(r) for r in e2.sql(
        "PREFIX : <http://ex/> SELECT ?n WHERE { :a :name ?n }").collect())
    assert got == [('"Alice"',)]


def test_boolean_literals_and_modifier_order(spark):
    rows = ROWS + [
        ("<http://ex/a>", "<http://ex/active>",
         '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>'),
        ("<http://ex/b>", "<http://ex/active>",
         '"false"^^<http://www.w3.org/2001/XMLSchema#boolean>'),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    e2 = SparqlEngine(df)
    # boolean literal in object position (exact typed-term match)
    got = sorted(tuple(r) for r in e2.sql(
        "SELECT ?s WHERE { ?s <http://ex/active> true }").collect())
    assert got == [("<http://ex/a>",)]
    # boolean literal in FILTER comparison (value compare)
    got = sorted(tuple(r) for r in e2.sql(
        "SELECT ?s WHERE { ?s <http://ex/active> ?v "
        "FILTER(?v = false) }").collect())
    assert got == [("<http://ex/b>",)]
    # OFFSET before LIMIT parses (either order is legal)
    got = e2.sql("SELECT ?n WHERE { ?s <http://ex/name> ?n } "
                 "ORDER BY ?n OFFSET 1 LIMIT 2").collect()
    assert len(got) == 2 and got[0][0] == '"Anon"'


def test_select_expressions(eng):
    got = q(eng, "SELECT ?n (UCASE(?n) AS ?u) WHERE "
                 "{ <http://ex/b> <http://ex/name> ?n }")
    assert got == [('"Bob"', "BOB")]
    got = q(eng, "SELECT (?a + 10 AS ?plus) WHERE "
                 "{ <http://ex/b> <http://ex/age> ?a }")
    assert got == [(35.0,)]
    got = q(eng, 'SELECT ?n (IF(STRLEN(?n) > 3, "long", "short") AS ?k) '
                 "WHERE { ?s <http://ex/name> ?n } ORDER BY ?n")
    assert ('"Bob"', "short") in got and ('"Alice"', "long") in got
    # SELECT expression feeding GROUP BY
    got = q(eng, "SELECT ?k (COUNT(?s) AS ?c) WHERE { ?s ?p ?o "
                 "BIND(STRLEN(STR(?p)) AS ?k) } GROUP BY ?k ORDER BY ?k")
    assert len(got) >= 2


def test_term_constructors(eng):
    got = q(eng, 'SELECT ?i WHERE { ?s <http://ex/name> ?n '
                 'BIND(IRI(CONCAT("http://ex/p/", STR(?n))) AS ?i) '
                 'FILTER(?n = "Bob") }')
    assert got == [("<http://ex/p/Bob>",)]
    got = q(eng, 'SELECT ?t WHERE { ?s <http://ex/name> ?n '
                 'BIND(STRDT(STR(?n), <http://www.w3.org/2001/XMLSchema#'
                 'string>) AS ?t) FILTER(?n = "Bob") }')
    assert got == [('"Bob"^^<http://www.w3.org/2001/XMLSchema#string>',)]
    got = q(eng, 'SELECT ?t WHERE { ?s <http://ex/name> ?n '
                 'BIND(STRLANG(STR(?n), "en") AS ?t) FILTER(?n = "Bob") }')
    assert got == [('"Bob"@en',)]
    # constructed IRI joins back against pattern-matched terms
    got = q(eng, 'SELECT ?n2 WHERE { ?s <http://ex/name> ?n '
                 'BIND(IRI("http://ex/b") AS ?b) . '
                 '?b <http://ex/name> ?n2 FILTER(?n = "Alice") }')
    assert got == [('"Bob"',)]
    # BNODE is deterministic per input
    rows = q(eng, 'SELECT ?z WHERE { ?s <http://ex/name> ?n '
                  'BIND(BNODE(STR(?n)) AS ?z) }')
    assert len({r[0] for r in rows}) == 4
    assert all(r[0].startswith("_:b") for r in rows)


def test_empty_group_unit_solution(eng):
    """Empty/pattern-free groups yield the unit solution (SPARQL §18.5):
    ASK {} is true, VALUES-only and BIND-only groups evaluate."""
    assert len(eng.sql("SELECT * WHERE { }").collect()) == 1
    assert eng.ask("ASK { }") is True
    got = sorted(r.x for r in eng.sql(
        'SELECT ?x WHERE { VALUES ?x { "a" "b" } }').collect())
    assert got == ['"a"', '"b"']
    got = eng.sql("SELECT ?y WHERE { BIND(2 + 3 AS ?y) }").collect()
    assert got[0].y == 5.0


def test_exists_in_compound_filter(eng):
    """(NOT) EXISTS composes inside boolean filter expressions via
    marker-column left joins."""
    got = q(eng, 'SELECT ?n WHERE { ?s <http://ex/name> ?n '
                 'FILTER(EXISTS { ?s <http://ex/age> ?a } '
                 '|| ?n = "Carol") }')
    assert got == [('"Alice"',), ('"Bob"',), ('"Carol"',)]
    got = q(eng, 'SELECT ?n WHERE { ?s <http://ex/name> ?n '
                 'FILTER(NOT EXISTS { ?s <http://ex/age> ?a } '
                 '&& STRSTARTS(STR(?n), "C")) }')
    assert got == [('"Carol"',)]
    # marker columns must not leak into the projection
    df = eng.sql('SELECT * WHERE { ?s <http://ex/name> ?n '
                 'FILTER(EXISTS { ?s <http://ex/age> ?a } || bound(?n)) }')
    assert not [c for c in df.columns if c.startswith("#exists")]


def test_bind_constant_joins_pattern(eng):
    """BIND(const AS ?v) then a pattern using ?v joins on the TERM (r6
    fix: the plain-value form never equalled the term strings, silently
    yielding zero rows)."""
    got = q(eng, 'SELECT ?s WHERE { BIND("Bob" AS ?n) '
                 '?s <http://ex/name> ?n }')
    assert got == [("<http://ex/b>",)]
    # IRI constant in SUBJECT position via BIND
    got = q(eng, 'SELECT ?n WHERE { BIND(<http://ex/b> AS ?s) '
                 '?s <http://ex/name> ?n }')
    assert got == [('"Bob"',)]
    # typed-literal constant
    got = q(eng, 'SELECT ?s WHERE { '
                 f'BIND("30"^^<{XSD_INT}> AS ?a) '
                 '?s <http://ex/age> ?a }')
    assert got == [("<http://ex/a>",)]
    # numeric constant joins by VALUE (engine '=' semantics)
    got = q(eng, "SELECT ?s WHERE { BIND(25 AS ?a) "
                 "?s <http://ex/age> ?a }")
    assert got == [("<http://ex/b>",)]
    # non-matching constant: empty, not everything
    got = q(eng, 'SELECT ?s WHERE { BIND("Zed" AS ?n) '
                 '?s <http://ex/name> ?n }')
    assert got == []


def test_bind_constant_projects_term_form(eng):
    """Fresh BIND constants serialize as terms — consistent with VALUES
    and pattern-bound variables (r6 fix: was the bare lexical)."""
    assert q(eng, 'SELECT ?x WHERE { BIND("a" AS ?x) }') == [('"a"',)]
    assert q(eng, "SELECT ?x WHERE { BIND(<http://ex/z> AS ?x) }") \
        == [("<http://ex/z>",)]
    # computed expressions keep the documented plain-value convention
    got = eng.sql("SELECT ?y WHERE { BIND(2 + 3 AS ?y) }").collect()
    assert got[0].y == 5.0


def test_bind_computed_collision_compares_by_value(eng):
    """A computed BIND over a pattern-bound var filters by value."""
    got = q(eng, 'SELECT ?s WHERE { ?s <http://ex/name> ?n '
                 '. ?s <http://ex/age> ?a . BIND(?a - 5 AS ?b) '
                 "FILTER(?b = 20) }")
    assert got == [("<http://ex/b>",)]
    # CONCAT collision: lexical-value comparison
    got = q(eng, 'SELECT ?s WHERE { ?s <http://ex/name> ?n '
                 '. BIND(CONCAT("B", "ob") AS ?n) }')
    assert got == [("<http://ex/b>",)]


def test_order_by_numeric_literals_sorts_by_value(spark):
    """SPARQL §15.4: numeric literals order by VALUE — a raw term-string
    sort puts "10" before "9" (r6 fix).  Mixed kinds rank unbound <
    blank < IRI < literal, deterministically."""
    rows = [("<http://ex/a>", "<http://ex/v>", f'"9"^^<{XSD_INT}>'),
            ("<http://ex/b>", "<http://ex/v>", f'"10"^^<{XSD_INT}>'),
            ("<http://ex/c>", "<http://ex/v>", f'"2"^^<{XSD_INT}>'),
            ("<http://ex/d>", "<http://ex/w>", '"zzz"'),
            ("_:bn", "<http://ex/w>", "<http://ex/iri>")]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    e2 = SparqlEngine(df)
    got = [r.v for r in e2.sql(
        "SELECT ?v WHERE { ?s <http://ex/v> ?v } ORDER BY ?v").collect()]
    assert [v[1:v.index('"', 1)] for v in got] == ["2", "9", "10"]
    got = [r.v for r in e2.sql(
        "SELECT ?v WHERE { ?s <http://ex/v> ?v } "
        "ORDER BY DESC(?v)").collect()]
    assert [v[1:v.index('"', 1)] for v in got] == ["10", "9", "2"]
    # subject position: blank node sorts before IRIs
    got = [r.s for r in e2.sql(
        "SELECT ?s WHERE { ?s <http://ex/w> ?o } ORDER BY ?s").collect()]
    assert got == ["_:bn", "<http://ex/d>"]
    # plain computed columns keep native value ordering
    got = [r.y for r in e2.sql(
        "SELECT ?y WHERE { ?s <http://ex/v> ?v . BIND(?v * 1 AS ?y) } "
        "ORDER BY ?y").collect()]
    assert got == [2.0, 9.0, 10.0]


def test_var_var_numeric_value_comparison(spark):
    """FILTER(?a op ?b) on two numeric literals compares VALUES even
    when lexical forms / datatypes differ (r6 fix: lexical comparison
    said "42" != "42.0" and "9" > "10")."""
    XD = "http://www.w3.org/2001/XMLSchema#decimal"
    rows = [("<http://ex/p1>", "<http://ex/lo>", f'"42"^^<{XSD_INT}>'),
            ("<http://ex/p1>", "<http://ex/hi>", f'"42.0"^^<{XD}>'),
            ("<http://ex/p2>", "<http://ex/lo>", f'"9"^^<{XSD_INT}>'),
            ("<http://ex/p2>", "<http://ex/hi>", f'"10"^^<{XSD_INT}>'),
            ("<http://ex/p3>", "<http://ex/lo>", '"abc"'),
            ("<http://ex/p3>", "<http://ex/hi>", '"abd"')]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    e2 = SparqlEngine(df)
    base = "SELECT ?s WHERE { ?s <http://ex/lo> ?a . " \
           "?s <http://ex/hi> ?b . FILTER(?a %s ?b) }"
    assert q(e2, base % "=") == [("<http://ex/p1>",)]
    assert q(e2, base % "<") == [("<http://ex/p2>",), ("<http://ex/p3>",)]
    assert q(e2, base % "!=") == [("<http://ex/p2>",), ("<http://ex/p3>",)]
    assert q(e2, base % ">=") == [("<http://ex/p1>",)]
