"""Native (pure-Catalyst) compiler for tabular logical sources.

When a triples map only uses column references, templates over columns and
constants (classic R2RML over an RDB — the reference's morph-xr2rml-rdb
module, MorphRDBUnfolder.scala:196-348 / MorphRDBDataTranslator.scala:48-231),
the whole materialization compiles to built-in Column expressions:
`concat`, `replace` chains for percent-encoding, equi-joins for
referencing object maps.  No Python runs per row — the plan stays inside
whole-stage codegen, filters and column pruning push down to the scan,
and Catalyst/AQE pick join strategies.

This is the scale path: the document compiler (engine.py) covers full
xR2RML (JSONPath, iterators, nested term maps); this one covers the
R2RML subset at parquet-native speed.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from . import namespaces as NS
from .functions.encoding import _ENCODE_RESERVED, _ENCODE_URL, encode_url
from .functions.templates import get_template_groups
from .model import (COLUMN, CONSTANT, TEMPLATE, MappingDocument, TermMap,
                    TriplesMap)
from .translate import EngineConfig

TRIPLE_COLS = ("subj", "pred", "obj", "graph")


def is_tabular_compilable(tm: TriplesMap) -> bool:
    """True when every term map of the TM uses only constant/column/
    template-over-columns and there is no iterator / nested term map /
    collection term type."""
    if tm.logical_source.iterator or tm.logical_source.pushdowns:
        return False

    def ok(m: Optional[TermMap]) -> bool:
        if m is None:
            return True
        if m.nested is not None or m.language_ref is not None:
            return False
        if m.is_collection_type():
            return False
        return m.kind in (CONSTANT, COLUMN, TEMPLATE)

    if not ok(tm.subject_map):
        return False
    for gm in tm.graph_maps:
        if not ok(gm):
            return False
    for pom in tm.predicate_object_maps:
        for m in pom.predicate_maps + pom.object_maps + pom.graph_maps:
            if not ok(m):
                return False
        for rom in pom.ref_object_maps:
            # join refs must be plain columns
            for jc in rom.join_conditions:
                if any(c in jc.child_ref for c in "$/(") or \
                   any(c in jc.parent_ref for c in "$/("):
                    return False
            if rom.is_collection():
                return False
    return True


# ---------------------------------------------------------------------------
# Column-expression builders
# ---------------------------------------------------------------------------

def encode_reserved_col(col: Column) -> Column:
    """GeneralUtility.encodeReservedChars as a chain of literal replaces
    (JVM-side, codegen-friendly)."""
    out = col
    for old, new in _ENCODE_RESERVED:
        out = F.replace(out, F.lit(old), F.lit(new))
    return out


def encode_url_col(col: Column) -> Column:
    """GeneralUtility.encodeURI (URL-UNSAFE chars only — ':' '/' '%' etc.
    stay) as native replaces; the whole-IRI encoding the Python tier
    applies in _make_term (translate.py:332-333)."""
    out = col
    for old, new in _ENCODE_URL:
        out = F.replace(out, F.lit(old), F.lit(new))
    return out


def encode_literal_col(col: Column, encode_quotes: bool = False) -> Column:
    """GeneralUtility.encodeLiteral as native expressions (same order;
    quote encoding off by default — see encoding.encode_literal)."""
    out = F.replace(col, F.lit("\\"), F.lit("/"))
    if encode_quotes:
        out = F.replace(out, F.lit('"'), F.lit("%22"))
    out = F.regexp_replace(out, "_{2,}", "_")
    out = F.replace(out, F.lit("\n"), F.lit(""))
    return F.replace(out, F.lit("\r"), F.lit(""))


# Python str.strip()'s whitespace set (str.isspace() over all of
# Unicode).  The Python translation tiers trim literals/IRIs with
# .strip() (translate.py — mirroring the reference's String.trim(),
# MorphBaseDataTranslator.scala:261); every NATIVE render and every
# native constraint mirror must trim the SAME set or a tab/NBSP-padded
# value renders differently across tiers (and a pushed filter could
# wrongly prune).  F.trim strips spaces only — never use it for the
# literal/IRI render.
_PY_STRIP_WS = "".join(map(chr, (
    0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20,
    0x85, 0xA0, 0x1680,
    0x2000, 0x2001, 0x2002, 0x2003, 0x2004, 0x2005, 0x2006, 0x2007,
    0x2008, 0x2009, 0x200A, 0x2028, 0x2029, 0x202F, 0x205F, 0x3000)))


def strip_ws_col(col: Column) -> Column:
    """Native twin of Python str.strip(): character-set trim over the
    exact isspace() alphabet (btrim is a set trim — no regex cost)."""
    return F.btrim(col, F.lit(_PY_STRIP_WS))


def nt_escape_col(col: Column) -> Column:
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    return F.replace(out, F.lit("\t"), F.lit("\\t"))


# ---------------------------------------------------------------------------
# SQL-text twins of the Column builders above.
#
# Building a term expression through the Column DSL costs one py4j round
# trip PER OPERATOR — a single percent-encoding chain is ~90 RPCs, a
# full kg_tpch compile ~3,700 (~0.7 s of driver time per query BUILD,
# profiled; guide §7.3 driver-side work).  Rendering the identical
# expression as ONE SQL string and parsing it with a single F.expr call
# removes that wall-clock without touching semantics: the strings below
# are the exact SQL forms of the Column chains, and unresolved column
# references behave identically (both resolve by name at analysis).
# ---------------------------------------------------------------------------

def sql_lit(s: str) -> str:
    """SQL string literal that parses back to exactly ``s`` under the
    default parser (backslash escape sequences ON)."""
    out = (s.replace("\\", "\\\\").replace("'", "\\'")
            .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))
    return "'" + out + "'"


def sql_ident(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _replace_chain_sql(inner: str, pairs) -> str:
    for old, new in pairs:
        inner = f"replace({inner}, {sql_lit(old)}, {sql_lit(new)})"
    return inner


def encode_reserved_sql(inner: str) -> str:
    """Text twin of encode_reserved_col."""
    return _replace_chain_sql(inner, _ENCODE_RESERVED)


def encode_url_sql(inner: str) -> str:
    """Text twin of encode_url_col."""
    return _replace_chain_sql(inner, _ENCODE_URL)


def encode_literal_sql(inner: str, encode_quotes: bool = False) -> str:
    """Text twin of encode_literal_col (same operation order)."""
    out = f"replace({inner}, {sql_lit(chr(92))}, '/')"
    if encode_quotes:
        out = f"replace({out}, '\"', '%22')"
    out = f"regexp_replace({out}, '_{{2,}}', '_')"
    out = f"replace({out}, {sql_lit(chr(10))}, '')"
    return f"replace({out}, {sql_lit(chr(13))}, '')"


def strip_ws_sql(inner: str) -> str:
    """Text twin of strip_ws_col (same isspace() alphabet)."""
    return f"btrim({inner}, {sql_lit(_PY_STRIP_WS)})"


def nt_escape_sql(inner: str) -> str:
    """Text twin of nt_escape_col."""
    return _replace_chain_sql(inner, (
        ("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"),
        ("\t", "\\t")))


_NATURAL_XSD = {
    T.IntegerType: NS.XSD_INTEGER, T.LongType: NS.XSD_INTEGER,
    T.ShortType: NS.XSD_INTEGER, T.ByteType: NS.XSD_INTEGER,
    T.DoubleType: NS.XSD + "double", T.FloatType: NS.XSD + "double",
    T.DecimalType: NS.XSD_DECIMAL, T.BooleanType: NS.XSD_BOOLEAN,
    T.TimestampType: NS.XSD_DATETIME, T.TimestampNTZType: NS.XSD_DATETIME,
    T.DateType: NS.XSD + "date",
}


def natural_datatype(dtype: T.DataType) -> Optional[str]:
    """R2RML natural mapping, mirroring the reference's DatatypeMapper
    (MorphRDBDataTranslator.scala:59-74)."""
    return _NATURAL_XSD.get(type(dtype))


def _col_as_string(df: DataFrame, name: str) -> Column:
    dtype = df.schema[name].dataType
    col = F.col(name)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # ISO lexical form with 'T' separator (translateDateTime semantics)
        return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss")
    if isinstance(dtype, T.BooleanType):
        return F.when(col, "true").otherwise("false")
    return col.cast("string")


def _col_as_string_sql(df: DataFrame, name: str) -> str:
    """Text twin of _col_as_string (same lexical forms)."""
    dtype = df.schema[name].dataType
    ident = sql_ident(name)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return f"date_format({ident}, {sql_lit(chr(39).join(('yyyy-MM-dd', 'T', 'HH:mm:ss')))})"
    if isinstance(dtype, T.BooleanType):
        return f"(CASE WHEN {ident} THEN 'true' ELSE 'false' END)"
    return f"CAST({ident} AS STRING)"


class NativeCompiler:
    """Compile tabular triples maps into a plan of native DataFrame ops."""

    def __init__(self, spark: SparkSession, mapping: MappingDocument,
                 tables: dict[str, DataFrame],
                 cfg: Optional[EngineConfig] = None,
                 term_style: str = "ntriples",
                 broadcast_parents: bool = False,
                 fuse_projections: bool = True,
                 tm_row_filters: Optional[dict] = None,
                 tm_skip: Optional[set] = None):
        """term_style: 'ntriples' → canonical lexical forms (engine
        output); 'plain' → raw value strings (oracle-comparable).

        fuse_projections: True → ONE scan per TM (explode over an array of
        (pred, obj) structs) — best for materialization throughput.
        False → one union branch per predicate-object map with a CONSTANT
        pred per branch, which lets Catalyst constant-fold away branches
        that a downstream pred filter can't match — best when querying the
        un-materialized pipeline (SPARQL over the plan).

        tm_row_filters: {tm_name: [ {col: constraint, ...}, ... ]} —
        OR-of-conjunctions row constraints derived by rewrite.py's
        pushdown, applied to the TM's OWN scan only (a ROM parent scan
        stays complete).  A constraint is a raw-equality lexical string
        (template inversion), ('lexeq', lex) rendered-literal equality,
        ('cmp', ((op, num), ...)) numeric predicates, or
        ('lexpat', kind, pat) STRSTARTS/STRENDS/CONTAINS mirrors — see
        _constraint_col.  tm_skip: TMs proven unable to contribute any
        matching triple — their sources are never read."""
        self.spark = spark
        self.mapping = mapping
        self.tables = tables
        self.cfg = cfg or EngineConfig()
        self.term_style = term_style
        self.broadcast_parents = broadcast_parents
        self.fuse_projections = fuse_projections
        self.tm_row_filters = tm_row_filters or {}
        self.tm_skip = frozenset(tm_skip or ())

    # -- term expressions ----------------------------------------------
    def _source_df(self, tm: TriplesMap) -> DataFrame:
        ls = tm.logical_source
        if ls.kind == "table":
            if ls.value in self.tables:
                return self.tables[ls.value]
            return self.spark.table(ls.value)
        # rr:sqlQuery over registered temp views
        return self.spark.sql(ls.value)

    def _iri_term(self, iri_value: Column) -> Column:
        if self.term_style == "ntriples":
            return F.concat(F.lit("<"), iri_value, F.lit(">"))
        return iri_value

    def _iri_term_sql(self, inner: str) -> str:
        if self.term_style == "ntriples":
            return f"concat('<', {inner}, '>')"
        return inner

    def _literal_term(self, value: Column, datatype: Optional[str],
                      lang: Optional[str]) -> Column:
        if self.term_style == "plain":
            return value
        body = F.concat(F.lit('"'), nt_escape_col(value), F.lit('"'))
        if lang:
            return F.concat(body, F.lit("@" + lang))
        if datatype:
            return F.concat(body, F.lit(f"^^<{datatype}>"))
        return body

    def _literal_term_sql(self, inner: str, datatype: Optional[str],
                          lang: Optional[str]) -> str:
        if self.term_style == "plain":
            return inner
        body = f"concat('\"', {nt_escape_sql(inner)}, '\"')"
        if lang:
            return f"concat({body}, {sql_lit('@' + lang)})"
        if datatype:
            return f"concat({body}, {sql_lit('^^<' + datatype + '>')})"
        return body

    def term_null_cond(self, df: DataFrame, m: TermMap) -> Optional[Column]:
        """Column form of term_null_cond_sql (None = never NULL)."""
        sql = self.term_null_cond_sql(df, m)
        return None if sql is None else F.expr(sql)

    def term_null_cond_sql(self, df: DataFrame, m: TermMap) -> Optional[str]:
        """Cheap per-row condition equivalent to ``term_expr(m).isNull()``
        — evaluated on the RAW source columns, so the null-guard filter
        does not have to build (and throw away) the rendered term string.
        None = the term is provably never NULL.

        Exactness: a CONSTANT term is never null; a COLUMN term is null
        iff the column is null — except BOOLEAN columns, whose lexical is
        when(col,'true').otherwise('false') and never null; a TEMPLATE
        term is null iff EVERY group's lexical is null (NULL groups
        render '', only the all-null row is dropped) — mirroring
        term_expr's all_null condition exactly."""
        if m.kind == CONSTANT:
            return None

        def col_null(name: str) -> Optional[str]:
            if isinstance(df.schema[name].dataType, T.BooleanType):
                return None          # 'false' lexical, never null
            return f"({sql_ident(name)} IS NULL)"

        if m.kind == COLUMN:
            return col_null(m.column)
        if m.kind == TEMPLATE:
            conds = []
            for g in get_template_groups(m.template):
                c = col_null(g)
                if c is None:
                    return None      # one never-null group ⇒ term never null
                conds.append(c)
            if not conds:
                return None          # group-less template: constant text
            return "(" + " AND ".join(conds) + ")"
        raise ValueError(f"term map kind {m.kind} not native-compilable")

    def term_expr(self, df: DataFrame, m: TermMap) -> Column:
        """Term map → Column producing the term (NULL → no triple).

        Internally composed as ONE SQL string parsed by a single
        F.expr call — the Column-DSL build of the same tree costs one
        py4j round trip per operator (~90 for one percent-encoding
        chain; ~0.7 s of driver time per kg_tpch build, profiled).
        Unresolved column references resolve by name exactly as the
        F.col-based build did (the ROM join relies on that)."""
        return F.expr(self.term_expr_sql(df, m))

    def term_expr_sql(self, df: DataFrame, m: TermMap) -> str:
        """term_expr as SQL text (the single source of truth)."""
        tt = m.infer_term_type()
        if m.kind == CONSTANT:
            c = m.constant
            if c[0] == "iri":
                return self._iri_term_sql(sql_lit(c[1]))
            if c[0] == "bnode":
                return sql_lit(f"_:{c[1]}"
                               if self.term_style == "ntriples" else c[1])
            return self._literal_term_sql(sql_lit(c[1]), m.datatype or c[2],
                                          m.language or c[3])
        if m.kind == COLUMN:
            raw = _col_as_string_sql(df, m.column)
            if tt == NS.RR_IRI:
                iri = raw
                if isinstance(df.schema[m.column].dataType, T.StringType):
                    # createIRI trims unconditionally (translate.py:331)
                    iri = strip_ws_sql(iri)
                    if self.cfg.encode_unsafe_chars_in_uri:
                        # whole-IRI encodeURI: URL-UNSAFE chars only —
                        # ':' '/' etc. stay (the reserved-chars encoder
                        # is for TEMPLATE GROUP content, not column
                        # IRIs; translate.py:330-333)
                        iri = encode_url_sql(iri)
                return self._iri_term_sql(iri)
            dtype = m.datatype or (natural_datatype(df.schema[m.column].dataType)
                                   if self.cfg.infer_datatypes and not m.language
                                   else None)
            val = raw
            if self.cfg.literal_trim:
                val = strip_ws_sql(val)
            if isinstance(df.schema[m.column].dataType, T.StringType):
                val = encode_literal_sql(val, self.cfg.encode_literal_quotes)
            return self._literal_term_sql(val, dtype, m.language)
        if m.kind == TEMPLATE:
            return self._template_expr_sql(df, m, tt)
        raise ValueError(f"term map kind {m.kind} not native-compilable")

    def _template_expr_sql(self, df: DataFrame, m: TermMap, tt: str) -> str:
        groups = get_template_groups(m.template)
        # split the template on the groups to get fixed segments
        segments = []
        rest = m.template
        for g in groups:
            fixed, _, rest = rest.partition("{" + g + "}")
            segments.append(fixed)
        # the Python tier applies encodeURI over the WHOLE expanded IRI
        # (_make_term, translate.py:332-333); group content is already
        # reserved-encoded (a superset of the URL-unsafe set), so the
        # whole-string pass only ever touches the FIXED segments —
        # encode them at compile time
        def fix(seg: str) -> str:
            if tt == NS.RR_IRI and self.cfg.encode_unsafe_chars_in_uri:
                return encode_url(seg)
            return seg

        parts: list[str] = []
        col_exprs: list[str] = []
        for seg, g in zip(segments, groups):
            if seg:
                parts.append(sql_lit(fix(seg)))
            raw = _col_as_string_sql(df, g)
            if tt == NS.RR_IRI and self.cfg.encode_unsafe_chars_in_db_values \
                    and isinstance(df.schema[g].dataType, T.StringType):
                raw = encode_reserved_sql(raw)
            col_exprs.append(raw)
            # NULL column value contributes '' (MorphRDBDataTranslator.scala:357-372)
            parts.append(f"coalesce({raw}, '')")
        if rest:
            parts.append(sql_lit(fix(rest)))
        expanded = f"concat({', '.join(parts)})"
        # all-groups-NULL → no term
        if col_exprs:
            all_null = " AND ".join(f"({ce} IS NULL)" for ce in col_exprs)
            expanded = f"(CASE WHEN {all_null} THEN NULL ELSE {expanded} END)"
        if tt == NS.RR_IRI:
            return self._iri_term_sql(expanded)
        if tt == NS.RR_BLANKNODE:
            # format_bnode applies encodeURI unconditionally over the
            # whole id (translate.py:336) — groups included, since bnode
            # groups get no reserved-encoding pass
            return f"concat('_:', {encode_url_sql(expanded)})"
        return self._literal_term_sql(expanded, m.datatype, m.language)

    # -- triples map compilation ----------------------------------------
    def tm_triples(self, tm: TriplesMap) -> DataFrame:
        """ONE scan per triples map: every (predicate, object) projection
        becomes an element of an array of structs exploded over the scan —
        the compile-time analogue of the reference's self-union
        elimination (AbstractQueryAtomicMongo.scala:331-349): N predicate-
        object maps cost one pass over the source, not N."""
        df = self._source_df(tm)
        flt = self.tm_row_filters.get(tm.name)
        if flt:
            df = df.where(self._constraint_col(df, flt))
        # every expression below is composed as SQL TEXT and parsed in
        # one call per projection/filter (see the module's text twins:
        # the Column-DSL build pays a py4j round trip per operator)
        subj_sql = self.term_expr_sql(df, tm.subject_map)

        # named graphs (R2RML §9/xR2RML quads): each class triple lands
        # in the subject map's graphs, each POM triple in subject ∪ POM
        # graphs; empty set = the default graph (NULL) — same expansion
        # as the document tier (translate.py:419-452, quad combination).
        # A NON-CONSTANT graph map can render NULL per row: the Python
        # tier drops that graph from the row's list and falls back to
        # the default graph only when EVERY render is null — mirrored
        # here with per-variant row conditions (constant graph maps fold
        # to unconditional variants)
        NULL_G = "CAST(NULL AS STRING)"
        sub_gs = [self.term_expr_sql(df, gm) for gm in tm.graph_maps]
        sub_kinds = [gm.kind for gm in tm.graph_maps]

        def graph_variants(gsqls: list, kinds: list
                           ) -> list[tuple[str, Optional[str]]]:
            """[(graph sql, row condition sql | None)] per quad-
            combination semantics over this POM's graph-map renders."""
            if not gsqls:
                return [(NULL_G, None)]
            if all(k == CONSTANT for k in kinds):
                return [(g, None) for g in gsqls]
            out = [(g, f"({g} IS NOT NULL)") for g in gsqls]
            allnull = " AND ".join(f"({g} IS NULL)" for g in gsqls)
            out.append((NULL_G, f"({allnull})"))
            return out

        rdf_type = self._iri_term_sql(sql_lit(NS.RDF_TYPE))
        po_trips: list[tuple] = []
        cond_parts: list[DataFrame] = []
        sub_variants = graph_variants(sub_gs, sub_kinds)

        # CHEAP null guards (r7): the produced triple set is unchanged —
        # a row is dropped iff its subject/object term renders NULL — but
        # the guard tests the RAW source columns instead of
        # isNotNull(<rendered term string>), so the filter no longer
        # builds every term string a second time just to check nullness
        subj_nn = self.term_null_cond_sql(df, tm.subject_map)

        def guards(frame: DataFrame, obj_nn: Optional[str]) -> DataFrame:
            conds = []
            if subj_nn is not None:
                conds.append(f"(NOT {subj_nn})")
            if obj_nn is not None:
                conds.append(f"(NOT {obj_nn})")
            if not conds:
                return frame
            return frame.where(F.expr(" AND ".join(conds)))

        def sel(frame: DataFrame, pred: str, obj: str, gc: str) -> DataFrame:
            return frame.selectExpr(
                f"{subj_sql} AS subj", f"{pred} AS pred",
                f"{obj} AS obj", f"{gc} AS graph")

        def emit(pred: str, obj: str, gc: str, cond: Optional[str],
                 obj_nn: Optional[str]) -> None:
            if cond is None:
                po_trips.append((pred, obj, gc, obj_nn))
            else:
                cond_parts.append(
                    sel(guards(df.where(F.expr(cond)), obj_nn),
                        pred, obj, gc))

        for cls in tm.class_uris:
            for gc, cond in sub_variants:
                emit(rdf_type, self._iri_term_sql(sql_lit(cls)), gc, cond,
                     None)

        rom_parts: list[DataFrame] = []
        for pom in tm.predicate_object_maps:
            gvars = graph_variants(
                sub_gs + [self.term_expr_sql(df, gm)
                          for gm in pom.graph_maps],
                sub_kinds + [gm.kind for gm in pom.graph_maps])
            pred_sqls = [self.term_expr_sql(df, pm)
                         for pm in pom.predicate_maps]
            for pred in pred_sqls:
                for om in pom.object_maps:
                    for gc, cond in gvars:
                        emit(pred, self.term_expr_sql(df, om), gc, cond,
                             self.term_null_cond_sql(df, om))
                for rom in pom.ref_object_maps:
                    for gc, cond in gvars:
                        rom_parts.append(self._rom_triples(
                            df.where(F.expr(cond)) if cond is not None
                            else df,
                            F.expr(subj_sql).alias("subj"), F.expr(pred),
                            rom,
                            None if gc is NULL_G else F.expr(gc),
                            subj_nn=None if subj_nn is None
                            else F.expr(subj_nn)))

        parts: list[DataFrame] = []
        if po_trips and (self.fuse_projections and len(po_trips) > 1):
            # fused: explode a flat INDEX and pick the (pred, obj, graph)
            # triple with a CASE — one output string per produced row,
            # instead of materializing an array of N pre-built structs
            # per source row (same strings, minus the array/struct
            # wrappers — ~10% off the translate stage at 33M triples)
            base = df.selectExpr(
                "*", f"explode(sequence(0, {len(po_trips) - 1})) AS _i")

            def case_over(vals: list[str]) -> str:
                whens = " ".join(f"WHEN _i = {i} THEN {v}"
                                 for i, v in enumerate(vals))
                return f"(CASE {whens} END)"

            pred_c = case_over([p for p, _o, _gc, _nn in po_trips])
            obj_c = case_over([o for _p, o, _gc, _nn in po_trips])
            # graph-less mapping (the common case): keep the constant
            # NULL instead of a per-row CASE over the index
            all_default = all(gc is NULL_G for _p, _o, gc, _nn in po_trips)
            graph_c = NULL_G if all_default else case_over(
                [gc for _p, _o, gc, _nn in po_trips])
            objnull_c: Optional[str] = None
            if any(nn is not None for _p, _o, _gc, nn in po_trips):
                objnull_c = case_over(
                    [nn if nn is not None else "false"
                     for _p, _o, _gc, nn in po_trips])
            base = guards(base, objnull_c)
            parts.append(base.selectExpr(
                f"{subj_sql} AS subj", f"{pred_c} AS pred",
                f"{obj_c} AS obj", f"{graph_c} AS graph"))
        elif po_trips:
            # unfused: one branch per (pred, obj, graph) with constant
            # preds — prunable by downstream pattern filters
            for p, o, gc, nn in po_trips:
                parts.append(sel(guards(df, nn), p, o, gc))
        parts.extend(cond_parts)
        parts.extend(rom_parts)
        if not parts:
            # a subject-only TM (no class, no predicate-object map) emits
            # no triples — R2RML generates rows only per POM/class
            from .engine import TRIPLE_SCHEMA
            return self.spark.createDataFrame([], TRIPLE_SCHEMA)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    @staticmethod
    def _term_source_columns(m: TermMap) -> list[str]:
        if m.kind == TEMPLATE:
            return get_template_groups(m.template)
        if m.kind == COLUMN:
            return [m.column]
        return []

    def _parent_key_renders_object(self, parent_tm, pdf: DataFrame,
                                   child_df: DataFrame, rom) -> bool:
        """Self-join-elimination precondition (the reference's
        xrr:uniqueRef / AbstractQueryAtomicMongo.scala:122-252 analogue):
        when the parent's subject term is built from EXACTLY the join
        column, the object can be rendered from the child's own join key
        — the parent scan degrades to a key-existence check (left_semi
        on bare keys) instead of an inner join shipping built subject
        strings.  Requires a single equi-condition, a DECLARED-UNIQUE
        parent key (xrr:uniqueRef, xR2RMLLogicalSource.scala:17-22 — the
        reference's precondition; without it a duplicate-keyed parent
        would emit N duplicate triples under the inner join but one
        under the probe, changing triples(dedup=False) multiplicity) and
        identical source dtypes (exact, incl. decimal precision) so both
        sides render the same lexical form."""
        if len(rom.join_conditions) != 1:
            return False
        jc = rom.join_conditions[0]
        if jc.parent_ref not in parent_tm.logical_source.unique_refs:
            return False
        if self._term_source_columns(parent_tm.subject_map) \
                != [jc.parent_ref]:
            return False
        if jc.parent_ref not in pdf.columns \
                or jc.child_ref not in child_df.columns:
            return False
        if pdf.schema[jc.parent_ref].dataType \
                != child_df.schema[jc.child_ref].dataType:
            return False
        # the substitution column must not shadow a DIFFERENT live child
        # column (the subject/pred expressions may reference it)
        if jc.parent_ref != jc.child_ref \
                and jc.parent_ref in child_df.columns:
            return False
        return True

    def _rom_triples(self, child_df: DataFrame, subj: Column, pred: Column,
                     rom, graph: Optional[Column] = None,
                     subj_nn: Optional[Column] = None) -> DataFrame:
        """Referencing object map = equi-join child×parent on the join
        columns; the reference generates a SQL LEFT JOIN
        (MorphRDBUnfolder.scala:284-320) — inner join is equivalent for
        triple generation (NULL object ⇒ no triple).

        Shuffle-byte minimization (the 100-TB lever): the child side
        shuffles only the raw join keys — subject and predicate strings
        are CONSTRUCTED AFTER the exchange, so a 30M-row child ships
        ~8-byte keys instead of ~70 bytes of pre-built IRI text per row.
        When the parent subject is keyed exactly by the join column the
        join itself collapses to a left_semi existence probe
        (_parent_subj_from_child_key)."""
        if not rom.join_conditions:
            # zero join conditions: the reference's intersection of zero
            # term sets is empty — never a cross product
            from .engine import TRIPLE_SCHEMA
            return self.spark.createDataFrame([], TRIPLE_SCHEMA)
        parent_tm = self.mapping.triples_maps[rom.parent_tm]
        pdf = self._source_df(parent_tm)
        pcols = [jc.parent_ref for jc in rom.join_conditions]
        ccols = [jc.child_ref for jc in rom.join_conditions]
        out_cols = [subj, pred.alias("pred")]
        if subj_nn is not None:
            # cheap child-subject null guard BEFORE the join: same rows
            # dropped as the old isNotNull(<rendered subj>) post-filter,
            # but tested on raw columns and pruning join probes early
            child_df = child_df.where(~subj_nn)

        if self._parent_key_renders_object(parent_tm, pdf, child_df, rom):
            # existence probe: bare parent keys, no subject strings built
            parent_keys = pdf.select(F.col(pcols[0]).alias(ccols[0]))
            if self.broadcast_parents:
                parent_keys = F.broadcast(parent_keys)
            kept = child_df.join(parent_keys, ccols[0], "left_semi") \
                           .withColumn(pcols[0], F.col(ccols[0]))
            key_obj = self.term_expr(kept, parent_tm.subject_map)
            g = F.lit(None).cast("string") if graph is None else graph
            return kept.select(*out_cols, key_obj.alias("obj"),
                               g.alias("graph"))

        parent_nn = self.term_null_cond(pdf, parent_tm.subject_map)
        if parent_nn is not None:
            # null parent subjects can never produce a triple (the old
            # plan dropped them via isNotNull(obj) AFTER the join)
            pdf = pdf.where(~parent_nn)
        parent_subj = self.term_expr(pdf, parent_tm.subject_map)
        parent_sel = pdf.select(
            parent_subj.alias("_psubj"),
            *[F.col(c).alias(f"_pk{i}") for i, c in enumerate(pcols)])
        if self.broadcast_parents:
            parent_sel = F.broadcast(parent_sel)
        # ship raw term-source columns through the exchange, not built
        # strings: the subj/pred Columns reference child columns by name
        # and resolve against the joined plan, so construction happens
        # AFTER the shuffle (Catalyst prunes the child side to the
        # source columns + join keys)
        joined = child_df.join(parent_sel, self._join_cond(ccols), "inner")
        g = F.lit(None).cast("string") if graph is None else graph
        return joined.select(*out_cols,
                             F.col("_psubj").alias("obj"),
                             g.alias("graph"))

    @staticmethod
    def _join_cond(ccols: list) -> Column:
        cond = None
        for i, c in enumerate(ccols):
            eq = F.col(c) == F.col(f"_pk{i}")
            cond = eq if cond is None else (cond & eq)
        return cond

    _NUMERIC_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                      T.FloatType, T.DoubleType, T.DecimalType)
    _CMP_OPS = {"=": Column.__eq__, "<": Column.__lt__, ">": Column.__gt__,
                "<=": Column.__le__, ">=": Column.__ge__}

    def _constraint_col(self, df: DataFrame, constraints: list) -> Column:
        """OR of constraint conjunctions.  Values are raw-equality strings
        (template inversions), ('lexeq', lex) rendered-literal lexical
        equality, or ('cmp', ((op, num), ...)) numeric value predicates.
        Equalities/comparisons on numeric columns convert to the native
        type so they reach the parquet scan as PushedFilters; string
        literal equality mirrors the render pipeline exactly (trim +
        encode_literal + NT escape) so it is sound AND exact."""
        def typed_eq(col: str, value: str) -> Column:
            dtype = df.schema[col].dataType
            try:
                if isinstance(dtype, (T.ByteType, T.ShortType,
                                      T.IntegerType, T.LongType)):
                    return F.col(col) == int(value)
                if isinstance(dtype, (T.FloatType, T.DoubleType,
                                      T.DecimalType)):
                    return F.col(col) == float(value)
            except ValueError:
                return F.lit(False)   # non-numeric lexical: no row matches
            if isinstance(dtype, T.StringType):
                return F.col(col) == value
            return _col_as_string(df, col) == value

        def rendered_lexical(col: str) -> Column:
            # the COLUMN-literal lexical pipeline of term_expr, mirrored
            val = _col_as_string(df, col)
            if self.cfg.literal_trim:
                val = strip_ws_col(val)
            if isinstance(df.schema[col].dataType, T.StringType):
                val = encode_literal_col(val, self.cfg.encode_literal_quotes)
            if self.term_style == "ntriples":
                val = nt_escape_col(val)
            return val

        def lex_eq(col: str, lex: str) -> Column:
            dtype = df.schema[col].dataType
            if isinstance(dtype, self._NUMERIC_TYPES):
                # value equality is a SUPERSET of lexical equality (the
                # evaluator re-applies the exact term match) and pushes
                # to parquet as an EqualTo on the native type
                return typed_eq(col, lex)
            return rendered_lexical(col) == lex

        def num_cmp(col: str, ops) -> Column:
            dtype = df.schema[col].dataType
            base = F.col(col) if isinstance(dtype, self._NUMERIC_TYPES) \
                else _col_as_string(df, col).try_cast("double")
            # natively-DECIMAL columns: a double literal forces
            # cast(col as double) > lit, which parquet cannot push.  When
            # the literal is exactly representable at the column's scale
            # AND the column's values are double-exact (precision <= 15,
            # within 2^53), a typed decimal compare is semantically
            # identical to the engine's double compare and lands in
            # PushedFilters (row-group skipping at scale).
            dec_ok = isinstance(dtype, T.DecimalType) and dtype.precision <= 15
            cond = None
            for op, lex in ops:
                if op not in self._CMP_OPS:
                    continue    # unknown op: skip the conjunct (superset,
                    # sound) — rewrite.py only emits the five _CMP_OPS
                rhs = None
                if dec_ok:
                    from decimal import Decimal, InvalidOperation
                    try:
                        d = Decimal(lex)
                        dq = d.quantize(Decimal(1).scaleb(-dtype.scale))
                        if d == dq and \
                                len(dq.as_tuple().digits) <= dtype.precision:
                            rhs = (F.col(col), F.lit(dq).cast(dtype))
                    except (InvalidOperation, ValueError):
                        return F.lit(False)
                if rhs is None:
                    try:
                        rhs = (base, F.lit(float(lex)))
                    except ValueError:
                        return F.lit(False)
                c = self._CMP_OPS[op](*rhs)
                cond = c if cond is None else (cond & c)
            return cond if cond is not None else F.lit(True)

        def pred_col(col: str, value) -> Column:
            if isinstance(value, tuple):
                if value[0] == "irieq":
                    # COLUMN-IRI render strips the value (createIRI trim)
                    # — mirror on the stripped column; non-string columns
                    # render from the cast (no padding possible)
                    if isinstance(df.schema[col].dataType, T.StringType):
                        return strip_ws_col(F.col(col)) == value[1]
                    return typed_eq(col, value[1])
                if value[0] == "lexeq":
                    return lex_eq(col, value[1])
                if value[0] == "cmp":
                    return num_cmp(col, value[1])
                if value[0] == "lexpat":
                    # STRSTARTS/STRENDS/CONTAINS over the rendered
                    # lexical (STR() of the produced literal)
                    rendered = rendered_lexical(col)
                    kind, pat = value[1], value[2]
                    if kind == "strstarts":
                        return rendered.startswith(pat)
                    if kind == "strends":
                        return rendered.endswith(pat)
                    return rendered.contains(pat)
            return typed_eq(col, value)

        ored = None
        for conj in constraints:
            c = F.lit(True)
            for col, value in conj.items():
                if col not in df.columns:
                    # a non-column reference (doc-tier constraint leaking
                    # into a tabular scan): dropping the term keeps a
                    # SUPERSET of the rows — sound
                    continue
                c = c & pred_col(col, value)
            ored = c if ored is None else (ored | c)
        return ored if ored is not None else F.lit(True)

    # -- compile-time uniqueness proof (dedup elimination) ---------------
    def _subject_unique(self, tm: TriplesMap, df: DataFrame) -> bool:
        return subject_renders_unique(tm, df)

    def _tm_po_signatures(self, tm: TriplesMap):
        """[(pred_iri, object_signature)] for the TM's per-row projections
        (ROMs excluded), or None when a predicate is non-constant.  The
        object signature is ('const', rendered) for constants and
        ('expr', i) — unique per slot — otherwise."""
        sigs = []
        for cls in tm.class_uris:
            sigs.append((NS.RDF_TYPE, ("const", "iri", cls)))
        slot = 0
        for pom in tm.predicate_object_maps:
            preds = []
            for pm in pom.predicate_maps:
                if pm.kind != CONSTANT or pm.constant is None \
                        or pm.constant[0] != "iri":
                    return None
                preds.append(pm.constant[1])
            for p in preds:
                for om in pom.object_maps:
                    if om.kind == CONSTANT and om.constant is not None:
                        sigs.append((p, ("const",) + tuple(om.constant)))
                    else:
                        sigs.append((p, ("expr", slot)))
                    slot += 1
        return sigs

    def _tm_branches_distinct(self, tm: TriplesMap, df: DataFrame) -> bool:
        """All of a TM's branches are duplicate-free and pairwise disjoint:
        distinct subjects per row (unique key), and per-row (pred, obj)
        slots that cannot collide (distinct constant preds, or the same
        pred only with pairwise-distinct constant objects)."""
        if not self._subject_unique(tm, df):
            return False
        sigs = self._tm_po_signatures(tm)
        if sigs is None:
            return False
        by_pred: dict = {}
        for p, sig in sigs:
            by_pred.setdefault(p, []).append(sig)
        rom_preds = []
        for pom in tm.predicate_object_maps:
            for pm in pom.predicate_maps:
                for _rom in pom.ref_object_maps:
                    rom_preds.append(pm.constant[1])
                    by_pred.setdefault(pm.constant[1], []).append(
                        ("rom", len(rom_preds)))
        for p, entries in by_pred.items():
            if len(entries) == 1:
                continue
            # same predicate twice: only provably disjoint when every
            # entry is a constant object and all constants differ
            if any(e[0] != "const" for e in entries):
                return False
            if len({e for e in entries}) != len(entries):
                return False
        # every ROM must have multiplicity exactly 1 per child row:
        # single- or multi-condition join against a declared-unique
        # parent key (the probe collapse implies this already)
        for pom in tm.predicate_object_maps:
            for rom in pom.ref_object_maps:
                parent = self.mapping.triples_maps[rom.parent_tm]
                puniq = set(parent.logical_source.unique_refs)
                if not any(jc.parent_ref in puniq
                           for jc in rom.join_conditions):
                    return False
        return True

    def _subject_space(self, tm: TriplesMap):
        return subject_space(tm)

    def _tm_pred_consts(self, tm: TriplesMap):
        """Set of constant predicate IRIs the TM emits, or None when any
        predicate map is dynamic."""
        preds = set()
        if tm.class_uris:
            preds.add(NS.RDF_TYPE)
        for pom in tm.predicate_object_maps:
            for pm in pom.predicate_maps:
                if pm.kind != CONSTANT or pm.constant is None \
                        or pm.constant[0] != "iri":
                    return None
                preds.add(pm.constant[1])
        return preds

    def provably_distinct(self) -> bool:
        """True when the WHOLE mapping provably emits no duplicate triple,
        so triples(dedup=True) can skip the global dedup exchange — the
        compile-time counterpart of the reference's Jena-set semantics
        (it needs a Model because it cannot prove this; we can, from
        xrr:uniqueRef + constant predicates + single-valued columns).
        Per-TM: subject unique per row and per-row slots disjoint
        (_tm_branches_distinct).  Across TMs: pairwise disjoint subject
        spaces (distinct term types, or neither fixed template prefix a
        prefix of the other) or disjoint constant predicate sets."""
        tms = [(name, tm) for name, tm in self.mapping.triples_maps.items()
               if name not in self.tm_skip]
        infos = []
        for _name, tm in tms:
            if tm.graph_maps or any(pom.graph_maps
                                    for pom in tm.predicate_object_maps):
                # named graphs multiply quads per (s,p,o); the branch
                # proofs below are triple-level -- keep the dedup
                return False
            df = self._source_df(tm)
            if not self._tm_branches_distinct(tm, df):
                return False
            infos.append((self._subject_space(tm), self._tm_pred_consts(tm)))
        for i in range(len(infos)):
            for j in range(i + 1, len(infos)):
                (sp_a, pr_a), (sp_b, pr_b) = infos[i], infos[j]
                if sp_a is not None and sp_b is not None:
                    (tt_a, px_a), (tt_b, px_b) = sp_a, sp_b
                    if tt_a != tt_b:
                        continue
                    if not (px_a.startswith(px_b) or px_b.startswith(px_a)):
                        continue
                if pr_a is not None and pr_b is not None \
                        and not (pr_a & pr_b):
                    continue
                return False
        return True

    def triples(self, dedup: bool = True) -> DataFrame:
        parts = [self.tm_triples(tm)
                 for name, tm in self.mapping.triples_maps.items()
                 if name not in self.tm_skip]
        self.dedup_eliminated = False
        if not parts:
            from .engine import TRIPLE_SCHEMA
            return self.spark.createDataFrame([], TRIPLE_SCHEMA)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if dedup:
            if self.provably_distinct():
                # uniqueness-driven dedup elimination: the mapping provably
                # emits a duplicate-free triple set, so the global
                # dropDuplicates exchange (the residual cost in the full
                # kg_tpch pipeline) is a no-op — skip it
                self.dedup_eliminated = True
                return out
            from .engine import dedup_triples
            # tabular R2RML emits one triple per (row, term map): duplicates
            # only exist if source rows repeat, so skip the map-side
            # partial agg (prepartition) — it collapses nothing here.
            # BUT only in fused (materialization) mode: the explicit
            # repartition blocks predicate pushdown, which the unfused
            # SPARQL-over-plan mode relies on to constant-fold
            # non-matching branches out of the plan (15 -> 6 scans)
            out = dedup_triples(out, prepartition=self.fuse_projections)
        return out


# ---------------------------------------------------------------------------
# Module-level uniqueness / subject-space proofs (shared with rewrite.py's
# cross-pattern constraint propagation)
# ---------------------------------------------------------------------------

# Rendered-value alphabets per source dtype, for multi-group template
# injectivity: a value of this type can only contain these characters, so
# a separator whose first char is OUTSIDE the union alphabet makes the
# template parse unique (leftmost-delimiter argument).
RENDER_ALPHABET = {
    T.ByteType: "0123456789-", T.ShortType: "0123456789-",
    T.IntegerType: "0123456789-", T.LongType: "0123456789-",
    T.DecimalType: "0123456789-.", T.DateType: "0123456789-",
    T.BooleanType: "truefals",
}
# dtypes whose string render is injective on distinct values (TIMESTAMP
# truncates sub-second precision; FLOAT/DOUBLE excluded out of caution)
NON_INJECTIVE_RENDER = (T.TimestampType, T.TimestampNTZType,
                        T.FloatType, T.DoubleType)


def subject_renders_unique(tm: TriplesMap, df: DataFrame) -> bool:
    """True when the TM's subject term is PROVABLY distinct per source
    row: built over a declared-unique reference (xrr:uniqueRef,
    xR2RMLLogicalSource.scala:17-22 — read as strict uniqueness: at most
    one row per value) through an injective render.  Single-group
    templates are injective in the value string (fixed prefix/suffix; IRI
    percent-encoding encodes '%' first so it is injective too);
    multi-group templates additionally need bounded value alphabets and
    separators starting outside them."""
    sm = tm.subject_map
    uniq = set(tm.logical_source.unique_refs)
    if sm.kind == COLUMN:
        col = sm.column
        if col not in uniq or col not in df.columns:
            return False
        return not isinstance(df.schema[col].dataType, NON_INJECTIVE_RENDER)
    if sm.kind != TEMPLATE:
        return False                # constant/dynamic subject: no proof
    groups = get_template_groups(sm.template)
    if not groups or not any(g in uniq for g in groups):
        return False
    if any(g not in df.columns for g in groups):
        return False
    dtypes = [df.schema[g].dataType for g in groups]
    if any(isinstance(dt, NON_INJECTIVE_RENDER) for dt in dtypes):
        return False
    if len(groups) == 1:
        return True
    # multi-group: bounded alphabets + delimiting separators.  NULL
    # caveat: a NULL group renders '' — sound because uniqueRef is taken
    # as strict (no two rows share the key, NULL included).
    alphabet = set()
    for dt in dtypes:
        chars = RENDER_ALPHABET.get(type(dt))
        if chars is None:
            return False            # string/unbounded value alphabet
        alphabet.update(chars)
    rest = sm.template
    seps = []
    for g in groups:
        _fixed, _, rest = rest.partition("{" + g + "}")
        seps.append(_fixed)
    for sep in seps[1:]:            # separators BETWEEN groups
        if not sep or sep[0] in alphabet:
            return False
    return True


def subject_renders_unique_schemaless(tm: TriplesMap) -> bool:
    """Document-tier twin of subject_renders_unique — no schema is
    available, so only the shapes that are injective for ANY value
    alphabet qualify: a SINGLE-group subject template whose group is a
    declared-unique reference (xrr:uniqueRef,
    xR2RMLLogicalSource.scala:17-22).  The group must be a plain
    (non-wildcard) path — a wildcard group renders one subject per
    matched element.  Restricted to NO-iterator TMs so that one source
    row IS one document: under an iterator a subject can repeat across
    the document's items, and item-relative references take several
    values per subject, which breaks cross-pattern AND-merging.

    uniqueRef is read as strict uniqueness of the RENDERED lexical
    (at most one document per stripped value lexical — the same
    strictness leap the tabular proof documents for NULLs): distinct
    documents then render distinct subjects, because a single-group
    template is injective in the value string (fixed prefix/suffix;
    percent-encoding encodes '%' first)."""
    if tm.logical_source.iterator:
        return False
    sm = tm.subject_map
    uniq = set(tm.logical_source.unique_refs)
    if not uniq:
        return False
    if sm.kind == TEMPLATE:
        groups = get_template_groups(sm.template)
        return (len(groups) == 1 and groups[0] in uniq
                and not any(ch in groups[0] for ch in "*[]()@"))
    return False


def subject_space(tm: TriplesMap):
    """(term-type, fixed-prefix) of every subject this TM renders, or
    None when unbounded.  Two spaces are disjoint when the term types
    differ or neither prefix is a prefix of the other."""
    sm = tm.subject_map
    tt = sm.infer_term_type()
    if sm.kind == TEMPLATE:
        groups = get_template_groups(sm.template)
        prefix = sm.template.partition("{" + groups[0] + "}")[0] \
            if groups else sm.template
        return (tt, prefix)
    if sm.kind == COLUMN:
        return (tt, "")
    if sm.kind == CONSTANT and sm.constant is not None:
        return (tt, sm.constant[1])
    return None


def subject_spaces_disjoint(a, b) -> bool:
    """Disjointness of two subject_space() results (None = unbounded)."""
    if a is None or b is None:
        return False
    (tt_a, px_a), (tt_b, px_b) = a, b
    if tt_a != tt_b:
        return True
    return not (px_a.startswith(px_b) or px_b.startswith(px_a))
