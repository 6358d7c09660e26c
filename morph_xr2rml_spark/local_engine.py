"""Single-process materializer — the executable semantic specification.

Runs the exact per-document translation the Spark engine distributes, with
the reference's nested-loop join semantics
(MorphMongoDataTranslator.scala:133-182).  Used by tests as the oracle the
Spark engine must match, and for golden-fixture generation.  Not a
production path — the Spark engine in ``engine.py`` is.
"""

from __future__ import annotations

import json
from typing import Iterable, Optional

from .model import MappingDocument, TriplesMap, parse_mongo_query
from .mongo_filter import compile_filter, parse_filter
from .paths import MixedSyntaxPath
from .translate import (CompiledTriplesMap, EngineConfig, expand_collection,
                        msp_join_keys, _compile_msp)


def _parse_docs(raw_docs: Iterable) -> list:
    """Parse JSON documents, skipping malformed ones — the reference
    suppresses per-document errors and continues
    (MorphMongoDataTranslator.scala:212-222)."""
    out = []
    for d in raw_docs:
        if isinstance(d, str):
            try:
                out.append(json.loads(d))
            except ValueError:
                continue
        else:
            out.append(d)
    return out


import re as _re

_SELECT_STAR_RE = _re.compile(r"^\s*select\s+\*\s+from\s+([A-Za-z_][\w.]*)\s*;?\s*$",
                              _re.IGNORECASE)


def _resolve_docs(tm: TriplesMap, sources: dict[str, Iterable]) -> list:
    """Logical source → list of parsed documents (find filter applied)."""
    ls = tm.logical_source
    if ls.kind == "query":
        coll, filter_text = parse_mongo_query(ls.value)
        docs = _parse_docs(sources[coll])
        pred = compile_filter(parse_filter(filter_text))
        return [d for d in docs if pred(d)]
    if ls.kind == "sql":
        m = _SELECT_STAR_RE.match(ls.value)
        if not m:
            raise ValueError(
                f"local engine supports only 'select * from <table>' SQL "
                f"sources (the Spark engine runs arbitrary SQL): {ls.value!r}")
        return _parse_docs(sources[m.group(1)])
    return _parse_docs(sources[ls.value])


def materialize_local(mapping: MappingDocument, sources: dict[str, Iterable],
                      cfg: Optional[EngineConfig] = None) -> set[tuple]:
    """Materialize every triples map; returns the deduplicated set of
    (subj, pred, obj, graph) in canonical N-Triples lexical form."""
    cfg = cfg or EngineConfig()
    triples: set[tuple] = set()

    compiled: dict[str, CompiledTriplesMap] = {}
    rom_base = 0
    for name, tm in mapping.triples_maps.items():
        ctm = CompiledTriplesMap(tm, cfg, rom_base)
        rom_base += ctm.rom_count
        compiled[name] = ctm

    # Pre-compute iterated documents per TM (scan reuse / query cache:
    # MorphMongoDataSourceReader.scala:96-113)
    iterated: dict[str, list] = {}
    for name, ctm in compiled.items():
        docs = _resolve_docs(ctm.tm, sources)
        out = []
        for d in docs:
            out.extend(ctm.iterate(d))
        iterated[name] = out

    for name, ctm in compiled.items():
        tm = ctm.tm
        # map global rom_id → (rom model, parent ctm)
        rom_meta = {}
        for preds, objs, roms, graphs, _cp, _co in ctm.poms:
            for rom_id, rom, cond_msps in roms:
                parent_name = rom.parent_tm
                rom_meta[rom_id] = (rom, compiled[parent_name])

        # parent candidate rows per rom: {rom_id: [(cond_id, key, subj, seq)]}
        parent_rows: dict[int, list] = {}
        for rom_id, (rom, parent_ctm) in rom_meta.items():
            parent_msps = [
                _compile_msp(jc.parent_ref, parent_ctm.tm.logical_source.ref_formulation)
                for jc in rom.join_conditions
            ]
            rows = []
            for seq, pdoc in enumerate(iterated[rom.parent_tm]):
                for cond_id, key, subj in parent_ctm.parent_rows(pdoc, parent_msps):
                    rows.append((cond_id, key, subj, seq))
            parent_rows[rom_id] = rows

        for doc in iterated[name]:
            res = ctm.translate_doc(doc)
            triples.update(res.triples)
            for s, p, coll, g in res.collections:
                _head, coll_triples = expand_collection(s, p, coll, g)
                triples.add((s, p, _head, g))
                triples.update(coll_triples)

            # refobjectmap joins: group this doc's join rows by (rom, s, p, g)
            by_ctx: dict[tuple, dict[int, set]] = {}
            for rom_id, cond_id, key, s, p, g in res.join_rows:
                ctx = (rom_id, s, p, g)
                by_ctx.setdefault(ctx, {}).setdefault(cond_id, set()).add(key)
            for (rom_id, s, p, g), keys_by_cond in by_ctx.items():
                rom, parent_ctm = rom_meta[rom_id]
                n_conds = len(rom.join_conditions)
                # per cond: parent subjects (ordered by parent seq) whose key
                # intersects the child's key set
                per_cond: list[list[tuple[int, str]]] = []
                for cond_id in range(n_conds):
                    child_keys = keys_by_cond.get(cond_id, set())
                    matches = [(seq, subj) for (c, key, subj, seq)
                               in parent_rows[rom_id]
                               if c == cond_id and key in child_keys]
                    per_cond.append(sorted(set(matches)))
                # AND across join conditions = subject-set intersection
                # (GeneralUtility.intersectMultipleTermSets)
                subj_sets = [set(sub for _seq, sub in m) for m in per_cond]
                common = set.intersection(*subj_sets) if subj_sets else set()
                ordered = [sub for _seq, sub in per_cond[0] if sub in common] \
                    if per_cond else []
                # keep first occurrence order, drop later duplicates
                seen = set()
                members = []
                for sub in ordered:
                    if sub not in seen:
                        seen.add(sub)
                        members.append(sub)
                if not members:
                    continue
                if rom.is_collection():
                    from .translate import CollTerm
                    coll = CollTerm(rom.term_type, members)
                    head, coll_triples = expand_collection(s, p, coll, g)
                    triples.add((s, p, head, g))
                    triples.update(coll_triples)
                else:
                    for sub in members:
                        triples.add((s, p, sub, g))
    return triples


def to_ntriples(triples: set[tuple]) -> str:
    lines = sorted(f"{s} {p} {o} ." for (s, p, o, g) in triples)
    return "\n".join(lines) + "\n"
