"""Logical-source resolution: mapping logical sources → DataFrames.

The canonical input is an Iceberg-style table of source-code repositories
``(repo, path, commit, lang, content)`` where ``content`` plays the role
of the MongoDB JSON document (BASELINE.json input_hint).  A mapping's
``xrr:query "db.<collection>.find({...})"`` resolves to a filtered view of
that table; the find() filter compiles to NATIVE Column predicates on
``get_json_object`` so Catalyst keeps the scan pruned and pushes the
partition filters down (the reference ships the filter to MongoDB —
MorphMongoDataSourceReader.scala:52-70; our equivalent is a pushed-down
DataFrame ``where``).
"""

from __future__ import annotations

import json
from typing import Callable, Optional

from pyspark.sql import DataFrame, functions as F

from .model import LogicalSource, parse_mongo_query
from .mongo_filter import normalize_filter_text


def mongo_filter_to_column(filter_text: str, content_col: str):
    """Compile a find() filter to a native Column predicate, or None if the
    filter uses operators we can only evaluate in Python.  Supported
    natively: {}, {field: value}, {field: {$exists: b}}, {$and: [...]},
    dotted paths — which covers every filter in the reference's examples."""
    spec = json.loads(normalize_filter_text(filter_text))
    return _spec_to_column(spec, content_col)


def _spec_to_column(spec: dict, content_col: str):
    cond = F.lit(True)
    for key, val in spec.items():
        if key == "$and":
            for sub in val:
                c = _spec_to_column(sub, content_col)
                if c is None:
                    return None
                cond = cond & c
        elif key == "$or":
            parts = [_spec_to_column(sub, content_col) for sub in val]
            if not parts or any(p is None for p in parts):
                return None
            ored = parts[0]
            for p in parts[1:]:
                ored = ored | p
            cond = cond & ored
        elif key.startswith("$"):
            return None
        else:
            extracted = F.get_json_object(F.col(content_col), f"$.{key}")
            if isinstance(val, dict):
                ops = list(val.items())
                for op, operand in ops:
                    if op == "$exists":
                        cond = cond & (extracted.isNotNull() if operand
                                       else extracted.isNull())
                    elif op == "$eq":
                        if _is_number(operand):
                            # numeric equality is cross-representation in
                            # Mongo/Python ({a:3} matches 3.0) but the
                            # extracted lexical form is "3" vs "3.0" —
                            # only the Python filter gets this right
                            return None
                        cond = cond & (extracted == F.lit(_json_scalar(operand)))
                    elif op == "$ne":
                        if _is_number(operand):
                            return None
                        # $ne keeps documents where the field is MISSING
                        # (extracted NULL): a bare != would evaluate to
                        # NULL there and wrongly drop them
                        cond = cond & (extracted.isNull() |
                                       (extracted != F.lit(_json_scalar(operand))))
                    elif op in ("$gt", "$gte", "$lt", "$lte") and \
                            _is_number(operand):
                        num = extracted.try_cast("double")
                        cond = cond & {
                            "$gt": num > operand, "$gte": num >= operand,
                            "$lt": num < operand, "$lte": num <= operand,
                        }[op]
                    elif op == "$in" and isinstance(operand, list):
                        if any(_is_number(v) for v in operand):
                            return None
                        cond = cond & extracted.isin(
                            [_json_scalar(v) for v in operand])
                    elif op == "$lexIn" and isinstance(operand, list):
                        # INTERNAL pushdown operator (rewrite.py): matches
                        # when the field's JSON lexical form is in the
                        # list — deliberately type-blind (number 7 and
                        # string "7" both have lexical '7'), which makes
                        # it natively compilable where Mongo's
                        # type-sensitive numeric equality is not
                        cond = cond & extracted.isin(
                            [str(v) for v in operand])
                    elif op == "$renderIn" and isinstance(operand, list):
                        # INTERNAL (rewrite.py object-literal pushdown):
                        # the doc-tier LITERAL RENDER of the field (trim
                        # + encode_literal of the lexical) is in the
                        # list, OR — for numeric members — the value
                        # compares numerically equal (a raw "7.50"
                        # renders "7.5"; the numeric arm keeps it)
                        from .native import encode_literal_col, strip_ws_col
                        rendered = encode_literal_col(strip_ws_col(extracted))
                        c = rendered.isin([str(v) for v in operand])
                        nums = [float(v) for v in operand
                                if _is_number(v) or
                                _looks_numeric(str(v))]
                        if nums:
                            c = c | extracted.try_cast("double").isin(nums)
                        cond = cond & c
                    elif op == "$renderPat" and isinstance(operand, list) \
                            and len(operand) == 2:
                        # INTERNAL (rewrite.py STRSTARTS/STRENDS/CONTAINS
                        # pushdown): pattern predicate over the doc-tier
                        # LITERAL RENDER of the field.  The engine
                        # compares the ESCAPED lexical (sparql.py
                        # lexical_value extracts without unescaping), so
                        # the mirror nt-escapes like the render does.
                        # Numeric values render their CANONICAL lexical
                        # ('1e3' → '1000.0'), which the raw text misses —
                        # the cast arm keeps those (superset, sound).
                        from .native import (encode_literal_col,
                                             nt_escape_col, strip_ws_col)
                        kind, pat = operand

                        def _pat(c, kind=kind, pat=str(pat)):
                            if kind == "strstarts":
                                return c.startswith(pat)
                            if kind == "strends":
                                return c.endswith(pat)
                            return c.contains(pat)

                        rendered = nt_escape_col(
                            encode_literal_col(strip_ws_col(extracted)))
                        num = extracted.try_cast("double")
                        cond = cond & (_pat(rendered) |
                                       (num.isNotNull() &
                                        _pat(num.cast("string"))))
                    elif op == "$numCmp" and isinstance(operand, dict):
                        # INTERNAL (rewrite.py comparison FILTERs):
                        # numeric value predicates; non-numeric lexicals
                        # try_cast to NULL and never match (the engine's
                        # numeric_value semantics)
                        num = extracted.try_cast("double")
                        for o, v in operand.items():
                            c = {"=": num == float(v), "<": num < float(v),
                                 ">": num > float(v), "<=": num <= float(v),
                                 ">=": num >= float(v)}.get(o)
                            if c is None:
                                return None
                            cond = cond & c
                    else:
                        return None
            else:
                if _is_number(val):
                    return None
                cond = cond & (extracted == F.lit(_json_scalar(val)))
    return cond


def mongo_filter_native_ok(filter_text: str) -> bool:
    """Session-free predicate: would mongo_filter_to_column succeed?
    (Column construction needs an active SparkContext; routing decisions
    — native_json.compilable — must not.)  Kept in lockstep with
    _spec_to_column; test_mongo_filter_breadth asserts parity."""
    try:
        spec = json.loads(normalize_filter_text(filter_text))
    except ValueError:
        return False
    return _spec_native_ok(spec)


def _spec_native_ok(spec: dict) -> bool:
    for key, val in spec.items():
        if key in ("$and", "$or"):
            if not isinstance(val, list) or not all(
                    isinstance(s, dict) and _spec_native_ok(s) for s in val):
                return False
            if key == "$or" and not val:
                return False
        elif key.startswith("$"):
            return False
        elif isinstance(val, dict):
            for op, operand in val.items():
                if op == "$exists":
                    continue
                if op in ("$eq", "$ne"):
                    if _is_number(operand):
                        return False
                elif op in ("$gt", "$gte", "$lt", "$lte"):
                    if not _is_number(operand):
                        return False
                elif op == "$in":
                    if not isinstance(operand, list) or \
                            any(_is_number(v) for v in operand):
                        return False
                elif op == "$lexIn":
                    if not isinstance(operand, list):
                        return False
                elif op == "$renderIn":
                    if not isinstance(operand, list):
                        return False
                elif op == "$renderPat":
                    if not (isinstance(operand, list) and len(operand) == 2
                            and operand[0] in ("strstarts", "strends",
                                               "contains")):
                        return False
                elif op == "$numCmp":
                    if not isinstance(operand, dict) or not all(
                            o in ("=", "<", ">", "<=", ">=")
                            and _is_number(v) for o, v in operand.items()):
                        return False
                else:
                    return False
        elif _is_number(val):
            return False
    return True


def _is_number(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _looks_numeric(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def _json_scalar(v) -> str:
    """get_json_object returns the JSON lexical form of scalars."""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


class SourceCatalog:
    """Maps logical-source names (Mongo collection names / table names) to
    DataFrames exposing a single JSON ``content`` column plus a stable
    ``_seq`` ordering column.

    ``_seq`` is assigned once per registration with
    ``monotonically_increasing_id`` — stable within a run (values are
    computed from deterministic input splits before any shuffle) and used
    only for deterministic RDF-list member ordering.

    CAVEAT (at-scale determinism): ``_seq`` encodes the partition layout,
    so RDF-list member order — and the content-derived bnode ids that
    hash over it — is only reproducible across runs while the input
    splits are identical (same files, same maxPartitionBytes).  This
    mirrors the reference, whose member order is MongoDB cursor order
    (also storage-layout-dependent).  Pipelines that need cross-run
    byte-stable list order should pre-sort the source on a key column
    and register that sorted frame."""

    def __init__(self):
        self._collections: dict[str, DataFrame] = {}
        self._tables: dict[str, DataFrame] = {}
        self._inputs: dict[str, DataFrame] = {}  # name -> input frame
        self._spark = None

    # -- registration ----------------------------------------------------
    def _invalidate_schema_cache(self) -> None:
        """Drop the JSON schema-sampling cache (native_json.py keys it on
        this catalog): re-registering a source with different data must
        not serve stale sampled schemas / unsafe-path verdicts."""
        if hasattr(self, "_json_schema_cache"):
            delattr(self, "_json_schema_cache")

    def register_collection(self, name: str, df: DataFrame,
                            content_col: str = "content") -> "SourceCatalog":
        """Register a document collection: df must have a JSON-text column."""
        if self._inputs.get(f"c:{name}:{content_col}") is df:
            return self          # same frame re-registered: keep the cache
        out = df.select(F.col(content_col).alias("content"))
        out = out.withColumn("_seq", F.monotonically_increasing_id())
        self._collections[name] = out
        self._inputs[f"c:{name}:{content_col}"] = df
        self._invalidate_schema_cache()
        return self

    def register_table(self, name: str, df: DataFrame) -> "SourceCatalog":
        """Register a tabular source (for rr:tableName / rr:sqlQuery
        logical sources): typed columns, translated to a row-dict document
        per row.  Also exposed as a temp view so rr:sqlQuery text can run
        against it."""
        if self._inputs.get(f"t:{name}") is df:
            return self          # same frame re-registered: keep the cache
        self._tables[name] = df
        self._spark = df.sparkSession
        df.createOrReplaceTempView(name)
        self._inputs[f"t:{name}"] = df
        self._invalidate_schema_cache()
        return self

    def register_repo_table(self, df: DataFrame,
                            collection_of: Optional[Callable[[str], object]] = None,
                            collections: Optional[list[str]] = None) -> "SourceCatalog":
        """Register the canonical (repo, path, commit, lang, content) table.
        Each collection name maps to the rows whose ``path`` starts with
        '<name>/' (overridable via ``collection_of`` returning a Column
        predicate for a name)."""
        names = collections or [r[0] for r in
                                df.select(F.split_part(F.col("path"), F.lit("/"), F.lit(1)))
                                  .distinct().collect()]
        for name in names:
            pred = (collection_of(name) if collection_of
                    else F.col("path").startswith(name + "/"))
            self.register_collection(name, df.where(pred))
        return self

    # -- resolution --------------------------------------------------------
    def resolve(self, ls: LogicalSource) -> tuple[DataFrame, bool]:
        """LogicalSource → (docs DataFrame(content, _seq), is_tabular)."""
        if ls.kind == "query" and ls.value.lstrip().startswith("db."):
            coll, filter_text = parse_mongo_query(ls.value)
            if coll not in self._collections:
                raise KeyError(f"Collection {coll!r} not registered; have "
                               f"{sorted(self._collections)}")
            df = self._collections[coll]
            cond = mongo_filter_to_column(filter_text, "content")
            if cond is not None:
                return df.where(cond), False
            # fallback: Python-side filter inside the translation stage
            return df, False
        # tabular source: rr:tableName or rr:sqlQuery
        name = ls.value
        if ls.kind == "sql":
            if self._spark is None:
                raise KeyError("rr:sqlQuery source needs register_table first")
            # arbitrary SQL over the registered temp views — the DB executed
            # this in the reference (MorphRDBUnfolder); Catalyst does here
            tdf = self._spark.sql(name)
        elif name in self._tables:
            tdf = self._tables[name]
        elif name in self._collections:
            return self._collections[name], False
        else:
            raise KeyError(f"Table {name!r} not registered")
        # represent each row as a JSON doc so column references resolve
        # uniformly in the translation core (row dict = document)
        doc = F.to_json(F.struct(*[F.col(c) for c in tdf.columns]))
        out = tdf.select(doc.alias("content")) \
                 .withColumn("_seq", F.monotonically_increasing_id())
        return out, True
