"""Mapping-model construction tests on the reference's real mapping files."""

from fixtures_data import MAPPING1_PATH

from morph_xr2rml_spark import namespaces as NS
from morph_xr2rml_spark.model import (CONSTANT, REFERENCE, TEMPLATE,
                                      MappingDocument, parse_mongo_query)

from conftest import requires_reference

pytestmark = requires_reference


def test_mapping1_structure():
    doc = MappingDocument.from_file(MAPPING1_PATH)
    assert set(doc.triples_maps) == {"#Students", "#Movies", "#Directors"}

    students = doc.triples_maps["#Students"]
    assert students.logical_source.kind == "query"
    coll, filt = parse_mongo_query(students.logical_source.value)
    assert coll == "students" and "$exists" in filt
    assert students.subject_map.kind == TEMPLATE
    assert students.subject_map.template == "http://example.org/student/{$._id}"
    assert students.class_uris == ["http://example.com/Student"]
    assert len(students.predicate_object_maps) == 5

    # POM 0: constant predicate + reference object
    pom0 = students.predicate_object_maps[0]
    assert pom0.predicate_maps[0].kind == CONSTANT
    assert pom0.predicate_maps[0].constant == ("iri", "http://example.com/isActive")
    assert pom0.object_maps[0].kind == REFERENCE
    assert pom0.object_maps[0].reference == "$.active"
    # reference-valued object map defaults to Literal
    assert pom0.object_maps[0].infer_term_type() == NS.RR_LITERAL

    # POM 2: language tag
    pom2 = students.predicate_object_maps[2]
    assert pom2.object_maps[0].language == "en"

    # POM 3: nested term map with languageReference
    pom3 = students.predicate_object_maps[3]
    ntm = pom3.object_maps[0].nested
    assert ntm is not None and ntm.reference == "$.hobby"
    assert ntm.language == "en" and ntm.language_ref == "$.lang"

    # POM 4: RdfList nested template with inner simple NTM
    pom4 = students.predicate_object_maps[4]
    om = pom4.object_maps[0]
    assert om.reference == "$.FullName"
    assert om.nested.kind == TEMPLATE
    assert om.nested.infer_term_type() == NS.XRR_RDFLIST
    assert om.nested.nested.datatype == NS.XSD + "string"
    # calculated member properties of the nested template TM
    collec, member_tt, dt, lang, lref = om.nested.calculated_props()
    assert collec == NS.XRR_RDFLIST and member_tt == NS.RR_LITERAL
    assert dt == NS.XSD + "string"


def test_mapping1_refobjectmap():
    doc = MappingDocument.from_file(MAPPING1_PATH)
    directors = doc.triples_maps["#Directors"]
    assert directors.logical_source.iterator == "$.directors.*"
    rom_pom = directors.predicate_object_maps[1]
    rom = rom_pom.ref_object_maps[0]
    assert rom.parent_tm == "#Movies"
    assert rom.join_conditions[0].child_ref == "$.movies.*"
    assert rom.join_conditions[0].parent_ref == "$.title"
    assert rom.term_type == NS.XRR_RDFLIST and rom.is_collection()


def test_pushdown_mapping3():
    doc = MappingDocument.from_file(
        "/root/reference/morph-xr2rml-dist/example_mongo/mapping3.ttl")
    # at least one TM has a logical-source pushDown or iterator
    has_pd = any(tm.logical_source.pushdowns or
                 any(pom.object_maps and pom.object_maps[0].pushdowns
                     for pom in tm.predicate_object_maps)
                 for tm in doc.triples_maps.values())
    assert has_pd or any(tm.logical_source.iterator
                         for tm in doc.triples_maps.values())
