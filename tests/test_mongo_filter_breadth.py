"""Round-3 find() filter breadth (VERDICT r2 item 5): $or, $regex
(incl. shell /pat/flags literals), numeric $in, $nin, $elemMatch.

The reference ships the filter verbatim to MongoDB
(MongoDBQuery.scala:67-90), so all of these work there; here the Python
fallback evaluates them with Mongo semantics and $or additionally
compiles to a native Column predicate.
"""

import pytest

from morph_xr2rml_spark.mongo_filter import (compile_filter,
                                             normalize_filter_text,
                                             parse_filter)
from morph_xr2rml_spark.sources import mongo_filter_to_column


def _f(text):
    return compile_filter(parse_filter(text))


def test_or_python():
    f = _f("{$or: [{a: 1}, {b: 'x'}]}")
    assert f({"a": 1}) and f({"b": "x"}) and f({"a": 1, "b": "y"})
    assert not f({"a": 2, "b": "y"}) and not f({})


def test_regex_python():
    f = _f("{name: {$regex: '^Al'}}")
    assert f({"name": "Alice"}) and not f({"name": "Bob"})
    assert not f({"name": 3}) and not f({})
    # case-insensitive via $options
    f = _f("{name: {$regex: '^al', $options: 'i'}}")
    assert f({"name": "Alice"})
    # array values: any string element may match
    f = _f("{tags: {$regex: 'ark'}}")
    assert f({"tags": ["spark", "sql"]}) and not f({"tags": ["flink"]})


def test_regex_shell_literal():
    # shell form /pat/flags normalizes to {$regex, $options}
    norm = normalize_filter_text("{name: /^al/i}")
    assert '"$regex"' in norm and '"$options"' in norm
    f = _f("{name: /^al/i}")
    assert f({"name": "Alice"}) and not f({"name": "Bob"})


def test_in_with_numbers():
    f = _f("{v: {$in: [1, 2.5, 'x']}}")
    assert f({"v": 1}) and f({"v": 2.5}) and f({"v": "x"})
    # Mongo numeric equality is cross-representation: 1.0 matches 1
    assert f({"v": 1.0})
    assert not f({"v": 3}) and not f({})


def test_nin_matches_missing_field():
    f = _f("{v: {$nin: [1, 2]}}")
    assert f({"v": 3}) and f({})           # missing field matches $nin
    assert not f({"v": 1})


def test_elem_match_document_form():
    f = _f("{items: {$elemMatch: {qty: {$gt: 5}, sku: 'a'}}}")
    assert f({"items": [{"qty": 10, "sku": "a"}]})
    assert not f({"items": [{"qty": 10, "sku": "b"},
                            {"qty": 2, "sku": "a"}]})
    assert not f({"items": "notalist"}) and not f({})


def test_elem_match_operator_form():
    f = _f("{scores: {$elemMatch: {$gt: 80, $lt: 90}}}")
    assert f({"scores": [75, 85]})
    assert not f({"scores": [75, 95]})


def test_native_or_column(spark):
    col = mongo_filter_to_column("{$or: [{a: 'x'}, {b: 'y'}]}", "content")
    assert col is not None
    df = spark.createDataFrame(
        [('{"a": "x"}',), ('{"b": "y"}',), ('{"a": "z"}',), ("{}",)],
        "content string")
    got = sorted(r.content for r in df.where(col).collect())
    assert got == ['{"a": "x"}', '{"b": "y"}']


def test_native_or_falls_back_when_branch_unsupported():
    # a numeric-eq branch can't compile natively → whole $or falls back
    assert mongo_filter_to_column("{$or: [{a: 1}, {b: 'y'}]}",
                                  "content") is None
    # $regex stays on the Python path (native can't tell "3" from 3)
    assert mongo_filter_to_column("{a: {$regex: 'x'}}", "content") is None


def test_python_native_parity_on_or(spark):
    """The same $or filter through the native Column and the Python
    fallback must select the same documents."""
    import json
    docs = [{"a": "x"}, {"b": "y"}, {"a": "z", "b": "y"}, {}, {"a": "y"}]
    text = "{$or: [{a: 'x'}, {b: 'y'}]}"
    pyf = _f(text)
    want = sorted(json.dumps(d) for d in docs if pyf(d))
    df = spark.createDataFrame([(json.dumps(d),) for d in docs],
                               "content string")
    col = mongo_filter_to_column(text, "content")
    got = sorted(r.content for r in df.where(col).collect())
    assert got == want


def test_native_ok_parity_with_column_compiler(spark):
    """mongo_filter_native_ok (session-free routing predicate) must agree
    with mongo_filter_to_column on every filter shape."""
    from morph_xr2rml_spark.sources import (mongo_filter_native_ok,
                                            mongo_filter_to_column)
    filters = [
        "{}", "{a: 'x'}", "{a: 1}", "{a: {$exists: true}}",
        "{a: {$eq: 'x'}}", "{a: {$eq: 3}}", "{a: {$ne: 'x'}}",
        "{a: {$ne: 3}}", "{a: {$gt: 5}}", "{a: {$gt: 'x'}}",
        "{a: {$in: ['x', 'y']}}", "{a: {$in: [1, 'y']}}",
        "{$and: [{a: 'x'}, {b: {$lt: 2}}]}",
        "{$or: [{a: 'x'}, {b: 'y'}]}",
        "{$or: [{a: 1}, {b: 'y'}]}",
        "{$or: []}",
        "{a: {$regex: 'x'}}", "{a: /x/i}",
        "{a: {$elemMatch: {b: 1}}}", "{a: {$nin: ['x']}}",
        "{'a.b.c': 'deep'}",
    ]
    for text in filters:
        ok = mongo_filter_native_ok(text)
        col = mongo_filter_to_column(text, "content")
        assert ok == (col is not None), \
            f"{text}: native_ok={ok} but column={'None' if col is None else 'Column'}"


def test_json_native_routing_respects_filter(spark):
    """A TM whose find() needs the Python fallback must leave the
    json-native tier (it would scan unfiltered there) — and an empty /
    native filter must stay, session or not."""
    from morph_xr2rml_spark.model import MappingDocument
    from morph_xr2rml_spark.native_json import compilable
    base = """
    @prefix rr: <http://www.w3.org/ns/r2rml#> .
    @prefix xrr: <http://i3s.unice.fr/xr2rml#> .
    @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
    @prefix ex: <http://example.com/> .
    <#TM> a rr:TriplesMap;
      xrr:logicalSource [ xrr:query "db.c.find(FILTER)";
                          rml:iterator "$.xs.*" ];
      rr:subjectMap [ rr:template "http://e/{$.t}" ];
      rr:predicateObjectMap [ rr:predicate ex:y;
                              rr:objectMap [ xrr:reference "$.y" ] ].
    """
    def tm_for(flt):
        m = MappingDocument.from_text(base.replace("FILTER", flt))
        return list(m.triples_maps.values())[0]
    assert compilable(tm_for("{}"))
    assert compilable(tm_for("{a: 'x'}"))
    assert not compilable(tm_for("{a: {$regex: 'x'}}"))
    assert not compilable(tm_for("{a: 3}"))
    assert not compilable(tm_for("{$or: [{a: 1}, {b: 'y'}]}"))


def test_size_operator():
    # shape from the reference's example dump:
    # db.movies2.find({actors: {$size: 2, $elemMatch: {$eq: "T. Leung"}}})
    f = _f('{actors: {$size: 2, $elemMatch: {$eq: "T. Leung"}}}')
    assert f({"actors": ["T. Leung", "G. Li"]})
    assert not f({"actors": ["M. Cheung"]})            # wrong size
    assert not f({"actors": ["A", "B"]})               # no match
    assert not f({"actors": "T. Leung"}) and not f({})
    # $size stays on the Python path
    from morph_xr2rml_spark.sources import mongo_filter_native_ok
    assert not mongo_filter_native_ok("{a: {$size: 2}}")
