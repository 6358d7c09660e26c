"""Mixed-syntax path & JSONPath tests, modeled on the reference's
MixedSyntaxPathTest.scala:13-162 and JSONPath_PathExpressionTest.scala."""

import json

from morph_xr2rml_spark import namespaces as NS
from morph_xr2rml_spark.paths import JSONPath, MixedSyntaxPath

DOC = json.dumps({
    "_id": {"$oid": "547f2a2b31f7a44bec07b21f"},
    "FullName": {"FirstNames": ["Paul", "Jack"], "LastName": "Smith"},
    "Hobbies": [{"hobby": "Swimming", "place": "pool"},
                {"hobby": "Calcio", "place": "stadium", "lang": "it"}],
    "id": 13, "active": False,
})


def test_simple_field():
    assert JSONPath("$.id").evaluate(DOC) == [13]
    assert JSONPath("$.active").evaluate(DOC) == [False]


def test_always_list_and_suppress():
    assert JSONPath("$.nope").evaluate(DOC) == []
    assert JSONPath("$.nope.deeper").evaluate(DOC) == []
    assert JSONPath("$.id").evaluate("not json") == []


def test_wildcards():
    assert JSONPath("$.Hobbies.*.hobby").evaluate(DOC) == ["Swimming", "Calcio"]
    assert JSONPath("$.FullName.FirstNames.*").evaluate(DOC) == ["Paul", "Jack"]
    assert JSONPath("$.FullName.FirstNames[*]").evaluate(DOC) == ["Paul", "Jack"]


def test_nonscalar_reserialized():
    # JSONPath_PathExpression.scala:54-57 — arrays/dicts → JSON text
    (v,) = JSONPath("$.FullName").evaluate(DOC)
    assert isinstance(v, str)
    assert json.loads(v) == {"FirstNames": ["Paul", "Jack"], "LastName": "Smith"}


def test_index_slice_union():
    assert JSONPath("$.FullName.FirstNames[0]").evaluate(DOC) == ["Paul"]
    assert JSONPath("$.FullName.FirstNames[-1]").evaluate(DOC) == ["Jack"]
    assert JSONPath("$.FullName.FirstNames[0:1]").evaluate(DOC) == ["Paul"]
    assert JSONPath("$.FullName.FirstNames[0,1]").evaluate(DOC) == ["Paul", "Jack"]
    assert JSONPath("$.FullName['LastName']").evaluate(DOC) == ["Smith"]


def test_deep_scan():
    assert sorted(JSONPath("$..hobby").evaluate(DOC)) == ["Calcio", "Swimming"]


def test_filters():
    assert JSONPath("$.Hobbies[?(@.lang == 'it')].hobby").evaluate(DOC) == ["Calcio"]
    assert JSONPath("$.Hobbies[?(@.lang)].hobby").evaluate(DOC) == ["Calcio"]


def test_oid():
    assert JSONPath("$._id.$oid").evaluate(DOC) == ["547f2a2b31f7a44bec07b21f"]


def test_mixed_column_jsonpath():
    msp = MixedSyntaxPath("Column(comments)/JSONPath($.*.hobby)", NS.REFFORM_COLUMN)
    assert msp.referenced_column == "comments"
    cell = json.dumps({"a": {"hobby": "chess"}, "b": {"hobby": "go"}})
    assert sorted(msp.evaluate(cell)) == ["chess", "go"]


def test_mixed_column_xpath():
    msp = MixedSyntaxPath("Column(name)/XPath(//FirstName)", NS.REFFORM_COLUMN)
    xml = "<Name><FirstName>Ada</FirstName><LastName>L</LastName></Name>"
    assert msp.evaluate(xml) == ["Ada"]


def test_mixed_csv():
    msp = MixedSyntaxPath("Column(code)/CSV(1)", NS.REFFORM_COLUMN)
    assert msp.evaluate("B, BSK, BK") == ["BSK"]


def test_plain_path_typed_by_formulation():
    assert MixedSyntaxPath("NAME", NS.REFFORM_COLUMN).is_pure_column()
    assert MixedSyntaxPath("$.a.b", NS.REFFORM_JSONPATH).is_pure_jsonpath()
