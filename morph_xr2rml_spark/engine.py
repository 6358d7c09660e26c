"""The Spark materialization engine: xR2RML mapping → triples DataFrame.

Architecture (Spark-first, not a port — the reference is a single-threaded
record-at-a-time loop, MorphMongoDataTranslator.scala:85-231):

  per triples map
      scan (native find-filter pushdown)                # Catalyst
      → mapInPandas translation stage                   # Arrow-batched
          parse JSON once, iterator fan-out, pushDown,
          all term maps, template cartesian expansion,
          RDF-collection expansion w/ deterministic bnodes
          → rows kind=0 (triples) | kind=2 (join keys)
      → refobjectmap joins: explode-both-sides EQUI-JOIN # replaces the
          + AND-intersection across join conditions     # reference's
          + collect_list for collection-typed results   # O(n·m) nested loop
  union all triples maps → dropDuplicates               # Jena set semantics

The per-document semantics live in translate.py and are shared with the
single-process oracle (local_engine.py), so Spark output == oracle output
by construction; tests assert it.
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (ArrayType, IntegerType, LongType, StringType,
                               StructField, StructType)

from .model import MappingDocument, TriplesMap, parse_mongo_query
from .mongo_filter import compile_filter, parse_filter
from .sources import SourceCatalog, mongo_filter_to_column
from .translate import CompiledTriplesMap, EngineConfig, expand_collection, \
    _compile_msp, CollTerm

def _fast_loads():
    """Fastest available JSON parser with stdlib-equivalent acceptance:
    orjson parses the same documents to the same Python values (floats
    are correctly-rounded IEEE doubles in both), but rejects a few
    shapes stdlib accepts (>64-bit ints, NaN/Infinity literals) — those
    fall back to json.loads, so the accepted-document set is exactly
    stdlib's.  ~5x faster parse on typical documents (guide §4.2: hand
    the per-batch work to native libraries)."""
    try:
        import orjson
    except ImportError:
        return json.loads

    def loads(raw, _oj=orjson.loads, _j=json.loads):
        try:
            return _oj(raw)
        except Exception:
            return _j(raw)
    return loads


# unified child-stage output schema
CHILD_SCHEMA = StructType([
    StructField("kind", IntegerType(), False),     # 0=triple 2=join row
    StructField("subj", StringType(), True),
    StructField("pred", StringType(), True),
    StructField("obj", StringType(), True),
    StructField("graph", StringType(), True),
    StructField("rom_id", IntegerType(), True),
    StructField("cond_id", IntegerType(), True),
    StructField("key", StringType(), True),
    StructField("uid", StringType(), True),        # per-iterated-doc id
])

PARENT_SCHEMA = StructType([
    StructField("rom_id", IntegerType(), False),
    StructField("cond_id", IntegerType(), False),
    StructField("key", StringType(), False),
    StructField("psubj", StringType(), False),
    StructField("pseq", LongType(), False),        # source row order
    StructField("pidx", IntegerType(), False),     # iterator index in row
])

TRIPLE_SCHEMA = StructType([
    StructField("subj", StringType(), False),
    StructField("pred", StringType(), False),
    StructField("obj", StringType(), False),
    StructField("graph", StringType(), True),
])


def dedup_triples(df: DataFrame, exact: bool = False,
                  prepartition: bool = False) -> DataFrame:
    """Set-semantics dedup of a triple DataFrame (Jena model equivalence).

    Default: group on a 128-bit key (two independently-streamed xxhash64
    values) instead of the ~150-byte string tuple — measured 3.6× faster
    at 16.5M triples (the aggregation hashtable compares 16-byte keys).
    Collision odds for DISTINCT triples ≈ n²/2^129: ~1.5e-15 at n=10^12.
    ``exact=True`` falls back to full-string comparison.

    ``prepartition=True`` repartitions by the hash pair BEFORE the
    aggregate, which makes the planner skip the map-side partial
    aggregation.  For mostly-distinct triple streams (the R2RML tabular
    case: one triple per source row per term map) the partial agg
    collapses nothing and just burns a per-task hashtable over the full
    data — measured ~18%% faster end-to-end at 33M triples.  Keep the
    default for document flows, where iterators re-emit the same triples
    and map-side collapse pays for itself."""
    if exact:
        return df.dropDuplicates(["subj", "pred", "obj", "graph"])
    cols = ["subj", "pred", "obj", "graph"]
    out = (df.withColumn("_h1", F.xxhash64(*cols))
             .withColumn("_h2", F.xxhash64(F.lit(1), *cols)))
    if prepartition:
        out = out.repartition(F.col("_h1"), F.col("_h2"))
    return out.dropDuplicates(["_h1", "_h2"]).drop("_h1", "_h2")


def _make_child_fn(tm: TriplesMap, cfg: EngineConfig, rom_base: int,
                   py_filter_text: Optional[str]):
    """Build the Arrow-batched translation stage for one triples map.
    The compiled TM is built lazily per task (compiled closures aren't
    picklable; the model dataclasses are)."""

    def translate_batches(batches: Iterator) -> Iterator:
        import pandas as pd
        ctm = CompiledTriplesMap(tm, cfg, rom_base)
        pyfilter = (compile_filter(parse_filter(py_filter_text))
                    if py_filter_text else None)
        cols = ("kind", "subj", "pred", "obj", "graph",
                "rom_id", "cond_id", "key", "uid")
        loads = _fast_loads()
        for pdf in batches:
            # tuple-row buffers: one append per row, columnized once per
            # batch with zip (C speed) — the per-row dict/append path costs
            # real memory bandwidth at fleet scale
            trips: list[tuple] = []
            joins: list[tuple] = []
            contents = pdf["content"].values
            seqs = pdf["_seq"].values
            for i in range(len(contents)):
                raw = contents[i]
                if raw is None:
                    continue
                try:
                    doc = loads(raw)
                except (ValueError, TypeError):
                    continue  # bad docs skip-and-continue
                if pyfilter is not None and not pyfilter(doc):
                    continue
                for idx, sub in enumerate(ctm.iterate(doc)):
                    res = ctm.translate_doc(sub)
                    trips.extend(res.triples)
                    for s, p, coll, g in res.collections:
                        head, ctriples = expand_collection(s, p, coll, g)
                        trips.append((s, p, head, g))
                        trips.extend(ctriples)
                    if res.join_rows:
                        uid = f"{seqs[i]}-{idx}"
                        for rom_id, cond_id, key, s, p, g in res.join_rows:
                            joins.append((rom_id, cond_id, key, s, p, g, uid))
            n_t, n_j = len(trips), len(joins)
            data = {}
            if n_j == 0:
                ts, tp, to, tg = zip(*trips) if trips else ((), (), (), ())
                data = {"kind": [0] * n_t, "subj": list(ts), "pred": list(tp),
                        "obj": list(to), "graph": list(tg),
                        "rom_id": [None] * n_t, "cond_id": [None] * n_t,
                        "key": [None] * n_t, "uid": [None] * n_t}
            else:
                ts, tp, to, tg = zip(*trips) if trips else ((), (), (), ())
                jr, jc, jk, js, jp, jg, ju = zip(*joins)
                data = {
                    "kind": [0] * n_t + [2] * n_j,
                    "subj": list(ts) + list(js),
                    "pred": list(tp) + list(jp),
                    "obj": list(to) + [None] * n_j,
                    "graph": list(tg) + list(jg),
                    "rom_id": [None] * n_t + list(jr),
                    "cond_id": [None] * n_t + list(jc),
                    "key": [None] * n_t + list(jk),
                    "uid": [None] * n_t + list(ju),
                }
            yield pd.DataFrame(data)

    return translate_batches


def _make_child_fn_lean(tm: TriplesMap, cfg: EngineConfig,
                        py_filter_text: Optional[str]):
    """ROM-free translation stage: emits the 4 triple columns directly.
    The unified CHILD_SCHEMA carries 5 extra join-bookkeeping columns
    (rom_id/cond_id/key/uid/kind) that are all-NULL when the TM has no
    referencing object map — per-row pandas/Arrow work for 18M × 5 dead
    cells on the corpus bench (guide §4.1: pass only the columns the
    stage needs), plus a kind==0 filter pass downstream."""

    def translate_batches(batches: Iterator) -> Iterator:
        import pandas as pd
        ctm = CompiledTriplesMap(tm, cfg, 0)
        pyfilter = (compile_filter(parse_filter(py_filter_text))
                    if py_filter_text else None)
        loads = _fast_loads()
        for pdf in batches:
            trips: list[tuple] = []
            for raw in pdf["content"].values:
                if raw is None:
                    continue
                try:
                    doc = loads(raw)
                except (ValueError, TypeError):
                    continue  # bad docs skip-and-continue
                if pyfilter is not None and not pyfilter(doc):
                    continue
                for sub in ctm.iterate(doc):
                    res = ctm.translate_doc(sub)
                    trips.extend(res.triples)
                    for s, p, coll, g in res.collections:
                        head, ctriples = expand_collection(s, p, coll, g)
                        trips.append((s, p, head, g))
                        trips.extend(ctriples)
            ts, tp, to, tg = zip(*trips) if trips else ((), (), (), ())
            yield pd.DataFrame({"subj": list(ts), "pred": list(tp),
                                "obj": list(to), "graph": list(tg)})

    return translate_batches


def _make_parent_fn(parent_tm: TriplesMap, cfg: EngineConfig,
                    rom_id: int, parent_refs: list[str],
                    py_filter_text: Optional[str]):
    """Parent-side extraction stage: (cond_id, key, parent_subject) rows."""

    def extract_batches(batches: Iterator) -> Iterator:
        import pandas as pd
        ctm = CompiledTriplesMap(parent_tm, cfg, 0)
        refform = parent_tm.logical_source.ref_formulation
        msps = [_compile_msp(r, refform) for r in parent_refs]
        pyfilter = (compile_filter(parse_filter(py_filter_text))
                    if py_filter_text else None)
        loads = _fast_loads()
        for pdf in batches:
            out = {k: [] for k in ("rom_id", "cond_id", "key", "psubj",
                                   "pseq", "pidx")}
            contents = pdf["content"].values
            seqs = pdf["_seq"].values
            for i in range(len(contents)):
                raw = contents[i]
                if raw is None:
                    continue
                try:
                    doc = loads(raw)
                except (ValueError, TypeError):
                    continue
                if pyfilter is not None and not pyfilter(doc):
                    continue
                for idx, sub in enumerate(ctm.iterate(doc)):
                    for cond_id, key, subj in ctm.parent_rows(sub, msps):
                        out["rom_id"].append(rom_id)
                        out["cond_id"].append(cond_id)
                        out["key"].append(key)
                        out["psubj"].append(subj)
                        out["pseq"].append(int(seqs[i]))
                        out["pidx"].append(idx)
            yield pd.DataFrame(out)

    return extract_batches


_COLL_OUT_SCHEMA = StructType([
    StructField("subj", StringType(), False),
    StructField("pred", StringType(), False),
    StructField("obj", StringType(), False),
    StructField("graph", StringType(), True),
])


def _expand_rom_collections(ctype: str):
    """mapInPandas stage expanding ROM join results grouped into member
    arrays → head triple + rdf:first/rest (or rdf:_n) member triples."""

    def expand(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = {"subj": [], "pred": [], "obj": [], "graph": []}
            for subj, pred, graph, members in zip(
                    pdf["subj"], pdf["pred"], pdf["graph"], pdf["members"]):
                coll = CollTerm(ctype, list(members))
                head, triples = expand_collection(subj, pred, coll, graph)
                rows["subj"].append(subj); rows["pred"].append(pred)
                rows["obj"].append(head); rows["graph"].append(graph)
                for s, p, o, g in triples:
                    rows["subj"].append(s); rows["pred"].append(p)
                    rows["obj"].append(o); rows["graph"].append(g)
            yield pd.DataFrame(rows)

    return expand


class SparkMaterializer:
    """Compile and run a mapping document against a source catalog."""

    def __init__(self, spark: SparkSession, mapping: MappingDocument,
                 catalog: SourceCatalog, cfg: Optional[EngineConfig] = None,
                 salt_partitions: int = 0,
                 tm_limit: Optional[int] = None,
                 tm_offset: Optional[int] = None):
        self.spark = spark
        self.mapping = mapping
        self.catalog = catalog
        self.cfg = cfg or EngineConfig()
        self.salt_partitions = salt_partitions
        # per-triples-map source row limit/offset — the reference's
        # datatranslation.limit/offset config (MorphProperties.scala:218-219,
        # applied as "LIMIT x OFFSET y" in SQLQuery.scala:392,410):
        # OFFSET skips first, LIMIT caps what remains
        self.tm_limit = tm_limit
        self.tm_offset = tm_offset
        # children persisted for ROM reuse; release via cleanup()
        self._persisted: list[DataFrame] = []
        self._rom_bases: dict[str, int] = {}
        base = 0
        for name, tm in mapping.triples_maps.items():
            self._rom_bases[name] = base
            base += sum(len(pom.ref_object_maps)
                        for pom in tm.predicate_object_maps)

    # ------------------------------------------------------------------
    def _source_and_pyfilter(self, tm: TriplesMap):
        """Resolve the TM's scan; returns (df, python_filter_text_or_None).
        When the find() filter compiled to a native predicate it is already
        applied inside resolve(); otherwise we pass the filter text to the
        translation stage."""
        ls = tm.logical_source
        df, _tabular = self.catalog.resolve(ls)
        py_filter = None
        if ls.kind == "query" and ls.value.lstrip().startswith("db."):
            _coll, filter_text = parse_mongo_query(ls.value)
            if mongo_filter_to_column(filter_text, "content") is None:
                py_filter = filter_text
        return df, py_filter

    def triples(self, dedup: bool = True) -> DataFrame:
        """The full materialization DataFrame (subj, pred, obj, graph)."""
        parts: list[DataFrame] = []
        for name, tm in self.mapping.triples_maps.items():
            parts.append(self._tm_triples(tm))
        if not parts:
            return self.spark.createDataFrame([], TRIPLE_SCHEMA)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if dedup:
            # prepartition (skip the map-side partial aggregate) when NO
            # triples map has an iterator: iterator re-emission is the
            # duplicate source that is doc-local — i.e. partition-local —
            # so the partial agg only earns its hashtable there.  Without
            # iterators the stream is mostly-distinct and the partial agg
            # is pure overhead (see dedup_triples; A/B: the skew-join
            # pipeline 1.94→1.68 s, the iterator corpus unchanged).
            no_iter = not any(tm.logical_source.iterator
                              for tm in self.mapping.triples_maps.values())
            out = dedup_triples(out, prepartition=no_iter)
        return out

    # ------------------------------------------------------------------
    def _tm_triples(self, tm: TriplesMap) -> DataFrame:
        rom_base = self._rom_bases[tm.name]
        src, py_filter = self._source_and_pyfilter(tm)
        if self.tm_offset is not None:
            src = src.offset(self.tm_offset)
        if self.tm_limit is not None:
            src = src.limit(self.tm_limit)
        roms = [(rom_base + i, rom)
                for i, rom in enumerate(
                    r for pom in tm.predicate_object_maps
                    for r in pom.ref_object_maps)]
        if not roms:
            # ROM-free TM: lean 4-column stage, no kind filter, no
            # persist — same triples, 5 fewer all-NULL Arrow columns.
            # Project to content ONLY: the lean stage never reads the
            # _seq ordering column (it exists for ROM collection
            # ordering), and MapInPandas ships every input column
            # through Arrow — column pruning cannot reach inside the
            # Python function (guide §4.1), so drop it here
            return src.select("content").mapInPandas(
                _make_child_fn_lean(tm, self.cfg, py_filter), TRIPLE_SCHEMA)
        child = src.mapInPandas(
            _make_child_fn(tm, self.cfg, rom_base, py_filter), CHILD_SCHEMA)
        # ROMs present (the ROM-free case early-returned above): the child
        # stage has two consumers (base triples + join rows) — persist so
        # the JSON-parse-heavy stage runs once; disk overflow for
        # executor-memory safety at scale
        from pyspark import StorageLevel
        child = child.persist(StorageLevel.MEMORY_AND_DISK)
        self._persisted.append(child)

        base = child.where(F.col("kind") == 0) \
                    .select("subj", "pred", "obj", "graph")
        parts = [base]
        for rom_id, rom in roms:
            parts.append(self._rom_triples(child, rom_id, rom))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def cleanup(self) -> None:
        """Unpersist the child stages cached for ROM reuse.  Call after the
        returned DataFrame has been materialized (written / collected) —
        long-lived sessions running many materializations would otherwise
        accumulate executor storage until eviction pressure."""
        for df in self._persisted:
            df.unpersist()
        self._persisted.clear()

    def _rom_triples(self, child: DataFrame, rom_id: int, rom) -> DataFrame:
        """One referencing-object-map: equi-join replacing the reference's
        nested-loop set-intersection join
        (MorphMongoDataTranslator.scala:133-182)."""
        if not rom.join_conditions:
            # the reference intersects the per-condition parent-subject sets;
            # the intersection of ZERO sets is List() (GeneralUtility.
            # intersectMultipleTermSets) — a no-condition ROM yields nothing
            return self.spark.createDataFrame([], TRIPLE_SCHEMA)
        parent_tm = self.mapping.triples_maps[rom.parent_tm]
        psrc, p_pyfilter = self._source_and_pyfilter(parent_tm)
        parent_refs = [jc.parent_ref for jc in rom.join_conditions]
        parent = psrc.mapInPandas(
            _make_parent_fn(parent_tm, self.cfg, rom_id, parent_refs,
                            p_pyfilter), PARENT_SCHEMA)

        # default-graph rows carry NULL; joins/groupBys must treat them as
        # equal, so use a sentinel and restore NULL at the end
        ckeys = child.where((F.col("kind") == 2) & (F.col("rom_id") == rom_id)) \
                     .select("cond_id", "key", "subj", "pred",
                             F.coalesce(F.col("graph"), F.lit("")).alias("graph"),
                             "uid")

        n_conds = len(rom.join_conditions)
        per_cond: list[DataFrame] = []
        for cond_id in range(n_conds):
            c = ckeys.where(F.col("cond_id") == cond_id) \
                     .dropDuplicates(["key", "subj", "pred", "graph", "uid"])
            p = parent.where(F.col("cond_id") == cond_id) \
                      .select("key", "psubj", "pseq", "pidx")
            if self.salt_partitions > 1:
                # explicit key salting for hot parent keys: replicate the
                # parent rows across salt buckets, salt the child randomly
                n = self.salt_partitions
                c = c.withColumn("_salt", (F.rand(42) * n).cast("int"))
                p = p.withColumn("_salt", F.explode(
                    F.sequence(F.lit(0), F.lit(n - 1))))
                joined = c.join(p, ["key", "_salt"]).drop("_salt")
            else:
                joined = c.join(p, "key")
            if rom.is_collection():
                # one row per (child ctx, parent subject), earliest parent
                # pos — the position orders collection members below
                joined = joined.groupBy("uid", "subj", "pred", "graph",
                                        "psubj") \
                               .agg(F.min(F.struct("pseq", "pidx"))
                                    .alias("ppos"))
            else:
                # plain ROM: the parent position is never used — dedup on
                # the five key columns directly.  Same rows, but a
                # HashAggregate instead of the SortAggregate that
                # min(struct(...)) forces (a full sort of the join output)
                joined = joined.dropDuplicates(
                    ["uid", "subj", "pred", "graph", "psubj"])
            per_cond.append(joined)

        # AND across join conditions = parent-subject set intersection
        # (GeneralUtility.intersectMultipleTermSets)
        result = per_cond[0]
        for other in per_cond[1:]:
            result = result.join(
                other.select("uid", "subj", "pred", "graph", "psubj"),
                ["uid", "subj", "pred", "graph", "psubj"])

        result = result.withColumn(
            "graph", F.when(F.col("graph") == "", F.lit(None)).otherwise(F.col("graph")))
        if rom.is_collection():
            grouped = result.groupBy("uid", "subj", "pred", "graph").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(
                        F.col("ppos.pseq").alias("pseq"),
                        F.col("ppos.pidx").alias("pidx"),
                        F.col("psubj").alias("psubj")))),
                    lambda x: x["psubj"]
                ).alias("members"))
            return grouped.select("subj", "pred", "graph", "members") \
                          .mapInPandas(_expand_rom_collections(rom.term_type),
                                       _COLL_OUT_SCHEMA) \
                          .select("subj", "pred", "obj", "graph")
        return result.select("subj", "pred",
                             F.col("psubj").alias("obj"), "graph")


def materialize(spark: SparkSession, mapping: MappingDocument,
                catalog: SourceCatalog,
                cfg: Optional[EngineConfig] = None, **kw) -> DataFrame:
    """One-call API: mapping + sources → deduplicated triples DataFrame."""
    return SparkMaterializer(spark, mapping, catalog, cfg, **kw).triples()
