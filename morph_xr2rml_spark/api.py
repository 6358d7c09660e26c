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
                     dedup: bool = True, **engine_kw) -> DataFrame:
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

    def json_native_ok(tm) -> bool:
        if not json_ok(tm):
            return False
        for pom in tm.predicate_object_maps:
            for rom in pom.ref_object_maps:
                if not json_ok(mapping.triples_maps[rom.parent_tm]):
                    return False
        return True

    native_tms = {n: tm for n, tm in mapping.triples_maps.items()
                  if native_ok(tm)}
    jn_tms = {n: tm for n, tm in mapping.triples_maps.items()
              if n not in native_tms and json_native_ok(tm)}
    doc_tms = {n: tm for n, tm in mapping.triples_maps.items()
               if n not in native_tms and n not in jn_tms}

    parts: list[DataFrame] = []
    if native_tms:
        nc = NativeCompiler(spark, mapping, tables, cfg)
        parts.extend(nc.tm_triples(tm) for tm in native_tms.values())
    if jn_tms:
        jc = JsonNativeCompiler(spark, mapping, catalog, cfg)
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
        from .engine import dedup_triples
        out = dedup_triples(out)
    return out
