"""Template / encoding / datatype unit tests — table-driven from the
reference's TemplateUtilityTest.scala:10-156 and GeneralUtility semantics."""

from morph_xr2rml_spark.functions.datatypes import (infer_datatype,
                                                    normalize_boolean,
                                                    normalize_datetime)
from morph_xr2rml_spark.functions.encoding import (encode_literal,
                                                   encode_reserved_chars,
                                                   encode_url)
from morph_xr2rml_spark.functions.templates import (cartesian_product,
                                                    compatible_templates,
                                                    get_template_groups,
                                                    get_template_matching,
                                                    replace_template_groups)
from morph_xr2rml_spark.namespaces import (XSD_BOOLEAN, XSD_DECIMAL,
                                           XSD_INTEGER)


def test_get_template_groups_simple():
    assert get_template_groups("http://example.org/student/{$._id}") == ["$._id"]
    assert get_template_groups("http://ex.org/{ID}/{NAME}") == ["ID", "NAME"]


def test_get_template_groups_mixed_syntax():
    # TemplateUtility.scala doc example
    tpl = "http://example.org/{ID}/{Column(NAME)/JSONPath($.x)}"
    assert get_template_groups(tpl) == ["ID", "Column(NAME)/JSONPath($.x)"]


def test_template_groups_with_braces_in_path():
    tpl = "{$.FirstNames.*} {$.LastName}"
    assert get_template_groups(tpl) == ["$.FirstNames.*", "$.LastName"]


def test_replace_template_groups_cartesian():
    tpl = "{$.FirstNames.*} {$.LastName}"
    out = replace_template_groups(tpl, [["Paul", "Jack"], ["Smith"]])
    assert out == ["Paul Smith", "Jack Smith"]


def test_cartesian_order_last_fastest():
    out = cartesian_product([["a", "b"], ["1", "2"]])
    assert out == [["a", "1"], ["a", "2"], ["b", "1"], ["b", "2"]]


def test_cartesian_empty_group_contributes_empty_string():
    out = cartesian_product([["a"], []])
    assert out == [["a", ""]]


def test_template_matching():
    m = get_template_matching("http://ex.org/{ID}/{NAME}", "http://ex.org/7/bob")
    assert m == {"ID": "7", "NAME": "bob"}


def test_compatible_templates():
    assert compatible_templates("http://e/{xx}/B{zz}", "http://e/{yy}/B{tt}")
    assert not compatible_templates("http://e/{xx}/B{zz}", "http://e/{yy}/C{tt}")


def test_encode_url():
    # URL special chars '#' '?' '/' ':' '&' '%' unchanged (GeneralUtility.scala:71-104)
    assert encode_url("a b") == "a%20b"
    assert encode_url("a#b/c:d&e?f%g") == "a#b/c:d&e?f%g"
    assert encode_url("In the Mood for Love") == "In%20the%20Mood%20for%20Love"
    assert encode_url('#{[|`^@]"') == '#%7B%5B%7C%60%5E%40%5D%22'


def test_encode_reserved_chars():
    assert encode_reserved_chars("a%b") == "a%25b"
    assert encode_reserved_chars("a/b:c") == "a%2Fb%3Ac"
    assert encode_reserved_chars("100%") == "100%25"


def test_encode_literal():
    # golden-faithful default: quotes preserved (result1-4.txt)
    assert encode_literal('say "hi"') == 'say "hi"'
    # current-code-faithful mode: '"' → %22 (GeneralUtility.scala:25)
    assert encode_literal('say "hi"', encode_quotes=True) == "say %22hi%22"
    assert encode_literal("back\\slash") == "back/slash"
    assert encode_literal("a___b") == "a_b"
    assert encode_literal("line1\nline2\r") == "line1line2"


def test_infer_datatype():
    assert infer_datatype(13) == XSD_INTEGER
    assert infer_datatype(1.5) == XSD_DECIMAL
    assert infer_datatype(True) == XSD_BOOLEAN
    assert infer_datatype("x") is None
    assert infer_datatype(None) is None


def test_normalizers():
    assert normalize_datetime("2020-01-01 10:00:00") == "2020-01-01T10:00:00"
    assert normalize_boolean("T") == "true"
    assert normalize_boolean("1") == "true"
    assert normalize_boolean("no") == "false"
