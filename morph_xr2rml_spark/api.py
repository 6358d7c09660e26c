"""Unified materialization facade.

``materialize_auto`` routes every triples map to the fastest compiler it
qualifies for:

  - pure-Catalyst native compiler (native.py) when the TM is
    tabular/R2RML-only (column/template/constant terms, plain-column
    joins, no iterator/nested maps) AND its refobjectmap parents are too;
  - the Arrow-batched document compiler (engine.py) otherwise.

One call, one deduplicated triple DataFrame — the drop-in equivalent of
the reference's ``MorphRunner`` materialization mode
(/root/reference/morph-xr2rml-dist/.../MorphRunner.scala:28-115).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from .engine import SparkMaterializer, TRIPLE_SCHEMA
from .model import MappingDocument
from .native import NativeCompiler, is_tabular_compilable
from .sources import SourceCatalog
from .translate import EngineConfig


def materialize_auto(spark: SparkSession, mapping: MappingDocument,
                     catalog: Optional[SourceCatalog] = None,
                     tables: Optional[dict[str, DataFrame]] = None,
                     cfg: Optional[EngineConfig] = None,
                     dedup: bool = True,
                     tm_row_filters: Optional[dict] = None,
                     fuse_projections: bool = True,
                     **engine_kw) -> DataFrame:
    """tm_row_filters: per-TM OR-of-conjunction row constraints for the
    NATIVE tier (rewrite.constrained_plan — document TMs carry theirs
    inside the composed find() filter already); fuse_projections is
    forwarded to NativeCompiler (False when SPARQL runs over the plan,
    so Catalyst can constant-fold unreachable predicate branches)."""
    cfg = cfg or EngineConfig()
    tables = tables or {}
    catalog = catalog or SourceCatalog()
    for name, df in tables.items():
        catalog.register_table(name, df)

    def native_ok(tm) -> bool:
        if not is_tabular_compilable(tm):
            return False
        if tm.logical_source.kind == "table" and \
                tm.logical_source.value not in tables:
            return False
        # a ROM's parent must live in the same compiler
        for pom in tm.predicate_object_maps:
            for rom in pom.ref_object_maps:
                parent = mapping.triples_maps[rom.parent_tm]
                if not is_tabular_compilable(parent) or \
                        (parent.logical_source.kind == "table" and
                         parent.logical_source.value not in tables):
                    return False
        return True

    from .native_json import JsonNativeCompiler, compilable as json_ok

    jc = JsonNativeCompiler(spark, mapping, catalog, cfg,
                            fuse_projections=fuse_projections)

    def json_native_ok(tm) -> bool:
        if not json_ok(tm):
            return False
        for pom in tm.predicate_object_maps:
            for rom in pom.ref_object_maps:
                if not json_ok(mapping.triples_maps[rom.parent_tm]):
                    return False
        # schema-sampling guard: a mapping-required leaf whose type the
        # sample could not pin (unseen / conflicting long-vs-double)
        # would silently drop or drift triples after row sample_n —
        # route those TMs to the document compiler instead
        if jc.unsafe_paths(tm):
            return False
        for pom in tm.predicate_object_maps:
            for rom in pom.ref_object_maps:
                if jc.unsafe_paths(mapping.triples_maps[rom.parent_tm]):
                    return False
        return True

    native_tms = {n: tm for n, tm in mapping.triples_maps.items()
                  if native_ok(tm)}
    jn_tms = {n: tm for n, tm in mapping.triples_maps.items()
              if n not in native_tms and json_native_ok(tm)}
    doc_tms = {n: tm for n, tm in mapping.triples_maps.items()
               if n not in native_tms and n not in jn_tms}

    parts: list[DataFrame] = []
    if native_tms and not jn_tms and not doc_tms:
        # all-native mapping: delegate so the uniqueness-driven dedup
        # elimination applies (provably-duplicate-free mappings skip the
        # global dropDuplicates exchange entirely)
        return NativeCompiler(spark, mapping, tables, cfg,
                              tm_row_filters=tm_row_filters,
                              fuse_projections=fuse_projections) \
            .triples(dedup=dedup)
    if native_tms:
        nc = NativeCompiler(spark, mapping, tables, cfg,
                            tm_row_filters=tm_row_filters,
                            fuse_projections=fuse_projections)
        parts.extend(nc.tm_triples(tm) for tm in native_tms.values())
    if jn_tms:
        parts.extend(jc.tm_base(tm) for tm in jn_tms.values())
    if doc_tms:
        sm = SparkMaterializer(spark, mapping, catalog, cfg, **engine_kw)
        parts.extend(sm._tm_triples(tm) for tm in doc_tms.values())

    if not parts:
        return spark.createDataFrame([], TRIPLE_SCHEMA)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if dedup:
        from .native_json import provably_distinct_json
        if not native_tms and provably_distinct_json(mapping):
            # document/json-native mapping provably emits no duplicate
            # (r6 — the doc-tier twin of the native compiler's dedup
            # elimination): skip the global exchange entirely
            return out
        from .engine import dedup_triples
        # native-tier TMs emit one triple per (row, term map) — mostly
        # distinct, where the map-side partial agg only burns memory
        # (measured 2.4x at 66M triples).  Document-tier TMs (iterator
        # re-emission) keep the default map-side collapse.
        out = dedup_triples(out, prepartition=not doc_tms)
    return out


def answer_auto(spark: SparkSession, mapping: MappingDocument,
                query_text,
                catalog: Optional[SourceCatalog] = None,
                tables: Optional[dict[str, DataFrame]] = None,
                cfg: Optional[EngineConfig] = None,
                **engine_kw) -> DataFrame:
    """Answer a SPARQL query with source pushdown wherever the mapping
    allows (the query-side twin of ``materialize_auto``):

      - every TM tabular with its table present → ``answer_tabular``
        (constraint inversion, cross-pattern propagation, TM
        elimination, parquet PushedFilters);
      - every TM a document source → ``answer_documents`` (constraints
        composed into find() via $lexIn/$renderIn/$numCmp);
      - MIXED relational + document (r6, the reference's federation
        bread-and-butter: per-source condition generation in
        MorphRDBUnfolder.scala:65-97 + MorphMongoDataSourceReader.scala:
        52-70) → constraints derived ONCE, routed per TM: ``.where``
        row filters / TM drops on the tabular scans, composed find()
        filters on the document scans, then one union plan under the
        evaluator;
      - anything else → SPARQL over the un-rewritten
        ``materialize_auto`` plan (no pushdown, always sound)."""
    from .rewrite import answer_documents, answer_tabular
    from .sparql import SparqlEngine, parse_sparql
    tables = tables or {}

    def tabular_ok(tm) -> bool:
        return is_tabular_compilable(tm) and (
            tm.logical_source.kind != "table"
            or tm.logical_source.value in tables)

    tms = mapping.triples_maps.values()
    if tms and all(tabular_ok(tm) for tm in tms):
        return answer_tabular(spark, mapping, tables, query_text,
                              cfg=cfg, **engine_kw)
    if tms and all(tm.logical_source.kind == "query" for tm in tms):
        return answer_documents(spark, mapping,
                                catalog or SourceCatalog(), query_text,
                                cfg=cfg, **engine_kw)
    q = query_text if not isinstance(query_text, str) \
        else parse_sparql(query_text)
    tm_row_filters = None
    eff_mapping = mapping
    if not engine_kw:
        # mixed-mapping aggregate/DISTINCT pushdown: each contributing
        # TM opens on whichever tier compiles it exactly; the union
        # spans tiers under one aggregate
        from .aggpush import try_aggregate_pushdown_auto
        fast = try_aggregate_pushdown_auto(spark, mapping, q,
                                           tables=tables,
                                           catalog=catalog or
                                           SourceCatalog(), cfg=cfg)
        if fast is not None:
            return fast
    if tms and all(tabular_ok(tm) or tm.logical_source.kind == "query"
                   for tm in tms):
        # mixed-tier pushdown: derive once, apply per tier
        from .rewrite import constrained_plan, derive_tm_constraints
        eff = cfg or EngineConfig()
        push_render = eff.literal_trim and not eff.encode_literal_quotes
        constraints = derive_tm_constraints(mapping, q, tables)
        eff_mapping, tm_row_filters = constrained_plan(
            mapping, constraints, push_render)
        if not eff_mapping.triples_maps:
            from .rewrite import _eng_answer
            triples = spark.createDataFrame([], TRIPLE_SCHEMA)
            eng = SparqlEngine(triples, dedup_source=True, **engine_kw)
            return _eng_answer(spark, eng, q)
    triples = materialize_auto(spark, eff_mapping, catalog=catalog,
                               tables=tables, cfg=cfg, dedup=False,
                               tm_row_filters=tm_row_filters,
                               fuse_projections=tm_row_filters is None)
    dedup_source = True
    if tm_row_filters is not None and eff_mapping.triples_maps:
        # mixed plan provably duplicate-free → skip the evaluator's
        # per-pattern dedup (same elimination the pure tiers get)
        from .rewrite import plan_provably_distinct
        dedup_source = not plan_provably_distinct(spark, eff_mapping,
                                                  tables)
    from .rewrite import _eng_answer
    eng = SparqlEngine(triples, dedup_source=dedup_source, **engine_kw)
    return _eng_answer(spark, eng, q)


def run_materialization(spark: SparkSession, properties_path: str,
                        catalog: Optional[SourceCatalog] = None,
                        tables: Optional[dict[str, DataFrame]] = None,
                        output_path: Optional[str] = None) -> DataFrame:
    """MorphRunner-equivalent one-shot (MorphRunner.scala:28-115): read a
    morph.properties file, materialize its mapping document, and — when
    ``output_path`` is given — serialize in the configured
    ``output.syntax.rdf`` (driver-side pretty writer, like the
    reference's whole-model Jena write).  Returns the triple DataFrame
    either way.  Database-connection properties don't apply: sources are
    DataFrames, registered via ``catalog``/``tables``."""
    from .properties import MorphProperties
    props = MorphProperties.from_file(properties_path)
    if props.mapping_path is None:
        raise ValueError("properties file lacks mappingdocument.file.path")
    mapping = MappingDocument.from_file(props.mapping_path)
    if props.tm_limit is not None or props.tm_offset is not None:
        # datatranslation.limit/offset slice the raw source rows — only
        # the document engine positions the slice before translation, so
        # route through it (the reference applies LIMIT/OFFSET in the
        # unfolded source query, SQLQuery.scala:392,410)
        cat = catalog or SourceCatalog()
        for name, df in (tables or {}).items():
            cat.register_table(name, df)
        sm = SparkMaterializer(spark, mapping, cat, props.config,
                               tm_limit=props.tm_limit,
                               tm_offset=props.tm_offset)
        triples = sm.triples()
    else:
        triples = materialize_auto(spark, mapping, catalog=catalog,
                                   tables=tables, cfg=props.config)
    if output_path is not None:
        from .rdf_io import serialize
        text = serialize(triples, props.output_syntax, mapping.prefixes)
        with open(output_path, "w", encoding="utf-8") as f:
            f.write(text)
    return triples
