"""morph.properties compatibility: parse the reference's real config files."""

from morph_xr2rml_spark.properties import MorphProperties, parse_properties

from conftest import requires_reference

REF = "/root/reference/morph-xr2rml-dist"


@requires_reference
def test_parse_reference_properties_files():
    for example in ("example_mongo", "example_mysql"):
        mp = MorphProperties.from_file(f"{REF}/{example}/morph.properties")
        assert mp.mapping_path and mp.mapping_path.endswith(".ttl")
        assert mp.config.literal_trim is True
        assert mp.output_syntax in ("TURTLE", "N-TRIPLE", "RDF/XML",
                                    "N3", "JSON-LD")
    mongo = MorphProperties.from_file(f"{REF}/example_mongo/morph.properties")
    # and the mapping it points to parses with our model
    from morph_xr2rml_spark.model import MappingDocument
    doc = MappingDocument.from_file(mongo.mapping_path)
    assert "#Students" in doc.triples_maps


def test_option_overrides():
    mp = MorphProperties.from_text("""
# comment
literal.trim=false
uricolumn.encode_unsafe_chars=false
datatranslation.limit=100
output.syntax.rdf=N-TRIPLE
""")
    assert mp.config.literal_trim is False
    assert mp.config.encode_unsafe_chars_in_uri is False
    assert mp.tm_limit == 100
    assert mp.output_syntax == "N-TRIPLE"


def test_parse_properties_basics():
    p = parse_properties("a=1\n# c\n  b = x y \n!ignored\nbad-line\n")
    assert p == {"a": "1", "b": "x y"}
