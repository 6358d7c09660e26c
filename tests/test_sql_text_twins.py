"""The native compiler renders term expressions as SQL text (one F.expr
parse instead of one py4j round trip per operator — OPTIMIZATION_r07).
These tests pin the text builders to the Column-DSL twins byte-for-byte
over adversarial values, so the two can never drift apart.
"""

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from morph_xr2rml_spark.native import (  # noqa: E402
    _PY_STRIP_WS, encode_literal_col, encode_literal_sql,
    encode_reserved_col, encode_reserved_sql, encode_url_col,
    encode_url_sql, nt_escape_col, nt_escape_sql, sql_ident, sql_lit,
    strip_ws_col, strip_ws_sql)

NASTY = [
    "plain",
    "spaces  and\ttabs\nnewline\rcr",
    "quote'single\"double",
    "back\\slash\\\\double",
    "percent%20encoded%",
    "unicode  nbsp ls　ideo og",
    " leading and trailing \t\n\x0b\x1c\x85\xa0  ",
    "__multi___underscore____",
    "{braces} [brackets] (parens) <angle>",
    "",
    None,
    "mixed'\\\"\n\t%_:#/?&=+,;@$!*",
    _PY_STRIP_WS,
]


@pytest.fixture(scope="module")
def nasty_df(spark):
    return spark.createDataFrame([(s,) for s in NASTY], "s string")


def _cmp(df, col_version, sql_text):
    rows = df.select(col_version.alias("a"),
                     F.expr(sql_text).alias("b")).collect()
    for r in rows:
        assert r.a == r.b, (r.a, r.b)


def test_sql_lit_roundtrip(nasty_df):
    for s in NASTY:
        if s is None:
            continue
        got = nasty_df.sparkSession.range(1) \
            .select(F.expr(sql_lit(s)).alias("x")).collect()[0].x
        assert got == s, repr(s)


def test_strip_ws_twin(nasty_df):
    _cmp(nasty_df, strip_ws_col(F.col("s")), strip_ws_sql(sql_ident("s")))


def test_encode_url_twin(nasty_df):
    _cmp(nasty_df, encode_url_col(F.col("s")), encode_url_sql(sql_ident("s")))


def test_encode_reserved_twin(nasty_df):
    _cmp(nasty_df, encode_reserved_col(F.col("s")),
         encode_reserved_sql(sql_ident("s")))


def test_encode_literal_twin(nasty_df):
    _cmp(nasty_df, encode_literal_col(F.col("s")),
         encode_literal_sql(sql_ident("s")))
    _cmp(nasty_df, encode_literal_col(F.col("s"), True),
         encode_literal_sql(sql_ident("s"), True))


def test_nt_escape_twin(nasty_df):
    _cmp(nasty_df, nt_escape_col(F.col("s")), nt_escape_sql(sql_ident("s")))


def _legacy_term_expr(comp, df, m):
    """The pre-r7 Column-DSL term_expr, reconstructed verbatim — the
    differential baseline for the text build."""
    from pyspark.sql import types as T
    from morph_xr2rml_spark import namespaces as NS
    from morph_xr2rml_spark.functions.encoding import encode_url
    from morph_xr2rml_spark.functions.templates import get_template_groups
    from morph_xr2rml_spark.model import COLUMN, CONSTANT, TEMPLATE
    from morph_xr2rml_spark.native import _col_as_string, natural_datatype

    tt = m.infer_term_type()
    if m.kind == CONSTANT:
        c = m.constant
        if c[0] == "iri":
            return comp._iri_term(F.lit(c[1]))
        if c[0] == "bnode":
            return F.lit(f"_:{c[1]}")
        return comp._literal_term(F.lit(c[1]), m.datatype or c[2],
                                  m.language or c[3])
    if m.kind == COLUMN:
        raw = _col_as_string(df, m.column)
        if tt == NS.RR_IRI:
            iri = raw
            if isinstance(df.schema[m.column].dataType, T.StringType):
                iri = strip_ws_col(iri)
                if comp.cfg.encode_unsafe_chars_in_uri:
                    iri = encode_url_col(iri)
            return comp._iri_term(iri)
        dtype = m.datatype or (
            natural_datatype(df.schema[m.column].dataType)
            if comp.cfg.infer_datatypes and not m.language else None)
        val = raw
        if comp.cfg.literal_trim:
            val = strip_ws_col(val)
        if isinstance(df.schema[m.column].dataType, T.StringType):
            val = encode_literal_col(val, comp.cfg.encode_literal_quotes)
        return comp._literal_term(val, dtype, m.language)
    assert m.kind == TEMPLATE
    groups = get_template_groups(m.template)
    segments, rest = [], m.template
    for g in groups:
        fixed, _, rest = rest.partition("{" + g + "}")
        segments.append(fixed)

    def fix(seg):
        if tt == NS.RR_IRI and comp.cfg.encode_unsafe_chars_in_uri:
            return encode_url(seg)
        return seg

    parts, col_exprs = [], []
    for seg, g in zip(segments, groups):
        if seg:
            parts.append(F.lit(fix(seg)))
        raw = _col_as_string(df, g)
        if tt == NS.RR_IRI and comp.cfg.encode_unsafe_chars_in_db_values \
                and isinstance(df.schema[g].dataType, T.StringType):
            raw = encode_reserved_col(raw)
        col_exprs.append(raw)
        parts.append(F.coalesce(raw, F.lit("")))
    if rest:
        parts.append(F.lit(fix(rest)))
    expanded = F.concat(*parts)
    all_null = None
    for ce in col_exprs:
        cond = ce.isNull()
        all_null = cond if all_null is None else (all_null & cond)
    if all_null is not None:
        expanded = F.when(all_null, F.lit(None)).otherwise(expanded)
    if tt == NS.RR_IRI:
        return comp._iri_term(expanded)
    return comp._literal_term(expanded, m.datatype, m.language)


def test_term_expr_matches_legacy_dsl(spark):
    """Differential: the text-built term_expr must equal the pre-r7
    Column-DSL build byte-for-byte over adversarial values, for every
    term map kind (constant / column incl. bool, double, timestamp /
    template with multiple groups)."""
    from morph_xr2rml_spark.model import MappingDocument
    from morph_xr2rml_spark.native import NativeCompiler

    rows = [
        (1, "a b'c\\d", 2.5, True, "2024-05-06 07:08:09"),
        (2, None, None, False, None),
        (3, " pad\tded  ", -0.0, None, "1999-12-31 23:59:59"),
        (4, "percent%__und__'\"q", 1e16, True, None),
    ]
    df = spark.createDataFrame(
        rows, "k int, name string, val double, flag boolean, ts_s string")
    df = df.withColumn("ts", F.col("ts_s").cast("timestamp"))
    mapping = MappingDocument.from_text("""
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix ex: <http://example.com/> .
<#T> rr:logicalTable [ rr:tableName "t" ];
  rr:subjectMap [ rr:template "http://example.org/x/{k}/{name}" ];
  rr:predicateObjectMap [ rr:predicate ex:name;
    rr:objectMap [ rr:column "name" ] ];
  rr:predicateObjectMap [ rr:predicate ex:val;
    rr:objectMap [ rr:column "val" ] ];
  rr:predicateObjectMap [ rr:predicate ex:flag;
    rr:objectMap [ rr:column "flag" ] ];
  rr:predicateObjectMap [ rr:predicate ex:ts;
    rr:objectMap [ rr:column "ts" ] ];
  rr:predicateObjectMap [ rr:predicate ex:iriCol;
    rr:objectMap [ rr:column "name"; rr:termType rr:IRI ] ].
""")
    comp = NativeCompiler(spark, mapping, {"t": df})
    tm = list(mapping.triples_maps.values())[0]
    maps = [tm.subject_map]
    for pom in tm.predicate_object_maps:
        maps.extend(pom.predicate_maps + pom.object_maps)
    cols = []
    for i, m in enumerate(maps):
        cols.append(comp.term_expr(df, m).alias(f"new{i}"))
        cols.append(_legacy_term_expr(comp, df, m).alias(f"old{i}"))
    for r in df.select(*cols).collect():
        for i in range(len(maps)):
            assert getattr(r, f"new{i}") == getattr(r, f"old{i}"), \
                (i, getattr(r, f"new{i}"), getattr(r, f"old{i}"))
