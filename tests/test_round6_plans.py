"""Round-6 plan audits (VERDICT r5 items 4-5).

LIMIT/ORDER answering: when the compiled triple pool is provably
duplicate-free (r5 uniqueness proofs), the evaluator skips its
per-pattern dropDuplicates — a `SELECT ... ORDER BY ?x LIMIT k` point
query then compiles to TakeOrderedAndProject directly over the filtered
scan with NO exchange at all (the reference plumbs slice through the
target query: AbstractQuery.limit, find().limit(n)
MorphMongoDataSourceReader.scala:65-68; Catalyst's top-k does it one
better once the exchange is gone).

Json-native dedup elimination: provably_distinct_json extends the
tabular dedup-elimination proof to no-iterator document mappings
(xrr:uniqueRef subjects, constant distinct predicates, static
single-valued object slots) — materialize_auto skips the global dedup
exchange; iterator mappings correctly stay unprovable.
"""

import pytest

from morph_xr2rml_spark.api import materialize_auto
from morph_xr2rml_spark.examples import (LINEITEM_JSON_MAPPING,
                                         ORDERDOC_FLAT_MAPPING,
                                         TPCH_KG_MAPPING, orderdocs_df,
                                         orderflat_catalog, tpch_tables)
from morph_xr2rml_spark.model import MappingDocument
from morph_xr2rml_spark.native_json import provably_distinct_json
from morph_xr2rml_spark.rewrite import answer_documents, answer_tabular
from morph_xr2rml_spark.sources import SourceCatalog

SF_DIR = "/root/testdata/sf0.001"
P = "PREFIX ex: <http://example.com/>\n"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# top-k answering without exchanges
# ---------------------------------------------------------------------------

def test_tabular_topk_is_take_ordered_no_exchange(spark):
    mapping = MappingDocument.from_text(TPCH_KG_MAPPING)
    df = answer_tabular(spark, mapping, tpch_tables(spark, SF_DIR), P + """
        SELECT ?o ?p WHERE { ?o ex:totalPrice ?p } ORDER BY ?p LIMIT 10""")
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "hashpartitioning" not in plan       # no dedup, no sort shuffle
    assert "rangepartitioning" not in plan
    rows = df.collect()
    assert len(rows) == 10
    vals = [float(r["p"].split('"')[1]) for r in rows]
    assert vals == sorted(vals)


def test_doc_topk_is_take_ordered_no_exchange(spark):
    mapping = MappingDocument.from_text(ORDERDOC_FLAT_MAPPING)
    df = answer_documents(spark, mapping, orderflat_catalog(spark, SF_DIR),
                          P + """
        SELECT ?s ?c WHERE { ?s ex:cust ?c } ORDER BY ?s LIMIT 10""")
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "hashpartitioning" not in plan
    assert "rangepartitioning" not in plan
    assert df.count() == 10


def test_point_query_no_exchange(spark):
    mapping = MappingDocument.from_text(TPCH_KG_MAPPING)
    df = answer_tabular(spark, mapping, tpch_tables(spark, SF_DIR), P + """
        SELECT ?p ?o WHERE { <http://example.org/order/1> ?p ?o }""")
    plan = _plan(df)
    # the only exchange allowed is the ROM broadcast build (no shuffle)
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan


# ---------------------------------------------------------------------------
# json-native dedup elimination
# ---------------------------------------------------------------------------

def test_doc_mapping_provably_distinct_skips_dedup(spark):
    mapping = MappingDocument.from_text(ORDERDOC_FLAT_MAPPING)
    assert provably_distinct_json(mapping)
    df = materialize_auto(spark, mapping,
                          catalog=orderflat_catalog(spark, SF_DIR))
    plan = _plan(df)
    assert "Aggregate" not in plan and "hashpartitioning" not in plan
    # 1500 docs x (rdf:type + status + cust + priority)
    n_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    assert df.count() == 4 * n_orders


def test_doc_dedup_elimination_matches_forced_dedup(spark):
    from morph_xr2rml_spark.engine import dedup_triples
    mapping = MappingDocument.from_text(ORDERDOC_FLAT_MAPPING)
    catalog = orderflat_catalog(spark, SF_DIR)
    fast = materialize_auto(spark, mapping, catalog=catalog, dedup=True)
    slow = dedup_triples(
        materialize_auto(spark, mapping, catalog=catalog, dedup=False))
    assert set(map(tuple, fast.collect())) == set(map(tuple, slow.collect()))


def test_iterator_mapping_stays_unprovable(spark):
    mapping = MappingDocument.from_text(LINEITEM_JSON_MAPPING)
    assert not provably_distinct_json(mapping)
    cat = SourceCatalog().register_collection(
        "orderdocs", orderdocs_df(spark, SF_DIR))
    df = materialize_auto(spark, mapping, catalog=cat)
    assert "hashpartitioning" in _plan(df)      # dedup exchange stays


def test_decimal_native_comparison_pushes_to_parquet(spark, tmp_path):
    """A comparison FILTER over a NATIVELY-decimal parquet column lands
    in PushedFilters as a typed decimal predicate (r6): the double-cast
    form blocked row-group skipping.  Exactness guard: precision <= 15
    and the literal representable at the column scale — otherwise the
    double path (DataFilters) stays."""
    from pyspark.sql import functions as F
    path = str(tmp_path / "orders_dec")
    (spark.read.parquet(f"{SF_DIR}/orders.parquet")
     .withColumn("o_totalprice", F.col("o_totalprice").cast("decimal(12,2)"))
     .write.mode("overwrite").parquet(path))
    tables = {"orders": spark.read.parquet(path),
              **{n: tpch_tables(spark, SF_DIR)[n]
                 for n in ("region", "nation", "customer")}}
    mapping = MappingDocument.from_text(TPCH_KG_MAPPING)
    df = answer_tabular(spark, mapping, tables, P + """
        SELECT ?o WHERE { ?o ex:totalPrice ?p . FILTER(?p > 200000.0) }""")
    plan = _plan(df)
    assert "GreaterThan(o_totalprice,200000.00)" in plan
    # result parity with the double-path engine semantics
    n = spark.read.parquet(path).where("o_totalprice > 200000.0").count()
    assert df.count() == n


def test_mixed_plan_provably_distinct(spark):
    from morph_xr2rml_spark.examples import MIXED_KG_MAPPING
    from morph_xr2rml_spark.rewrite import plan_provably_distinct
    mapping = MappingDocument.from_text(MIXED_KG_MAPPING)
    tables = {"customer": tpch_tables(spark, SF_DIR)["customer"]}
    assert plan_provably_distinct(spark, mapping, tables)
    # adversarial: doc TM without uniqueRef → refused
    weak = MappingDocument.from_text(
        MIXED_KG_MAPPING.replace('; xrr:uniqueRef "$.ok"', ""))
    assert not plan_provably_distinct(spark, weak, tables)
    # adversarial: doc TM rendering into the customer subject space
    clash = MappingDocument.from_text(MIXED_KG_MAPPING.replace(
        "http://example.org/odoc/{$.ok}",
        "http://example.org/customer/{$.ok}"))
    assert not plan_provably_distinct(spark, clash, tables)


def test_mixed_answering_drops_evaluator_dedup(spark):
    """A SELECT over the mixed mapping has NO aggregate in its plan —
    per-pattern dropDuplicates (HashAggregate over subj/pred/obj) is
    eliminated by the cross-tier distinctness proof."""
    from morph_xr2rml_spark.api import answer_auto
    from morph_xr2rml_spark.examples import MIXED_KG_MAPPING
    mapping = MappingDocument.from_text(MIXED_KG_MAPPING)
    df = answer_auto(
        spark, mapping,
        P + 'SELECT ?o ?c WHERE { ?o ex:placedBy ?c ; ex:status "F" }',
        catalog=orderflat_catalog(spark, SF_DIR),
        tables={"customer": tpch_tables(spark, SF_DIR)["customer"]})
    assert "Aggregate" not in _plan(df)
    assert df.count() > 0


def test_ask_through_answer_paths(spark):
    """ASK returns a one-row boolean frame from every answering path
    (previously it fell through to the SELECT evaluator)."""
    from morph_xr2rml_spark.api import answer_auto
    mapping = MappingDocument.from_text(TPCH_KG_MAPPING)
    tables = tpch_tables(spark, SF_DIR)
    t = answer_auto(spark, mapping,
                    P + 'ASK { ?c ex:segment "BUILDING" }', tables=tables)
    assert [r["ask"] for r in t.collect()] == [True]
    f = answer_auto(spark, mapping,
                    P + 'ASK { ?c ex:segment "NO_SUCH" }', tables=tables)
    assert [r["ask"] for r in f.collect()] == [False]
    dm = MappingDocument.from_text(ORDERDOC_FLAT_MAPPING)
    d = answer_documents(spark, dm, orderflat_catalog(spark, SF_DIR),
                         P + 'ASK { ?s ex:status "F" }')
    assert [r["ask"] for r in d.collect()] == [True]


def test_no_uniqueref_stays_unprovable():
    text = ORDERDOC_FLAT_MAPPING.replace('; xrr:uniqueRef "$.ok"', "")
    assert not provably_distinct_json(MappingDocument.from_text(text))


def test_same_pred_two_refs_stays_unprovable():
    # two references under ONE predicate could hold equal values →
    # identical triples are possible
    text = ORDERDOC_FLAT_MAPPING.replace(
        'rr:predicateObjectMap [ rr:predicate ex:cust; '
        'rr:objectMap [ xrr:reference "$.ck" ] ];',
        'rr:predicateObjectMap [ rr:predicate ex:status; '
        'rr:objectMap [ xrr:reference "$.ck" ] ];')
    assert not provably_distinct_json(MappingDocument.from_text(text))


def test_wildcard_object_stays_unprovable():
    text = ORDERDOC_FLAT_MAPPING.replace('xrr:reference "$.ck"',
                                         'xrr:reference "$.ck.*"')
    assert not provably_distinct_json(MappingDocument.from_text(text))


def test_overlapping_subject_spaces_stay_unprovable():
    # second TM rendering into the SAME subject space with an
    # overlapping predicate set → cross-TM duplicates possible
    extra = """
<#ODoc2>
    a rr:TriplesMap;
    xrr:logicalSource [ xrr:query "db.orderflat.find({})"; xrr:uniqueRef "$.ok" ];
    rr:subjectMap [ rr:template "http://example.org/odoc/{$.ok}" ];
    rr:predicateObjectMap [ rr:predicate ex:status; rr:objectMap [ xrr:reference "$.st" ] ].
"""
    assert not provably_distinct_json(
        MappingDocument.from_text(ORDERDOC_FLAT_MAPPING + extra))
