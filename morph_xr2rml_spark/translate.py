"""Per-document translation core: apply a triples map to one JSON document.

This is the pure-Python heart of the engine.  It runs on executors inside
Arrow-batched ``mapInPandas`` stages (one batch = thousands of documents),
so it is written allocation-consciously: term maps are pre-compiled once
per task, documents are parsed once, and all evaluation happens on parsed
objects.

Semantics mirror the reference's record-at-a-time translator:
  - MorphMongoDataTranslator.generateRDFTriples
    (/root/reference/morph-xr2rml-mongo/.../MorphMongoDataTranslator.scala:56-211)
  - translateData* (same file :244-398)
  - MorphBaseDataTranslator.translateMultipleValues / createIRI /
    createLiteral / createCollection
    (/root/reference/morph-base/.../MorphBaseDataTranslator.scala:180-324)
  - materializeQuads cross-product
    (/root/reference/morph-base/.../MorphBaseMaterializer.scala:159-200)
  - iterator + pushDown fan-out
    (/root/reference/morph-xr2rml-mongo/.../MorphMongoDataSourceReader.scala:117-160,
     /root/reference/morph-xr2rml-lang/.../xR2RMLPushDown.scala:94-191)
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Any, Optional

from . import namespaces as NS
from .functions.datatypes import (infer_datatype, normalize_boolean,
                                  normalize_datetime, to_lexical)
from .functions.encoding import (encode_literal, encode_reserved_chars,
                                 encode_url)
from .functions.templates import (cartesian_product, compile_template,
                                  expand_segments, get_template_groups,
                                  replace_template_groups)
from .model import (CONSTANT, REFERENCE, SIMPLE_NTM, TEMPLATE, COLUMN,
                    PushDown, TermMap, TriplesMap)
from .paths import JSONPath, MixedSyntaxPath


@dataclass
class EngineConfig:
    """Runtime options with the reference's defaults
    (MorphProperties.scala:45-48)."""
    literal_trim: bool = True
    encode_unsafe_chars_in_uri: bool = True
    encode_unsafe_chars_in_db_values: bool = True
    infer_datatypes: bool = True
    # golden-faithful default: the reference's result1-4.txt goldens keep
    # raw quotes in literals (see encoding.encode_literal)
    encode_literal_quotes: bool = False


# ---------------------------------------------------------------------------
# Lexical N-Triples forms — the engine's canonical term representation
# ---------------------------------------------------------------------------

def nt_escape(s: str) -> str:
    return (s.replace("\\", "\\\\").replace('"', '\\"')
             .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))


def format_iri(iri: str) -> str:
    return f"<{iri}>"


def format_literal(lexical: str, datatype: Optional[str], lang: Optional[str]) -> str:
    body = f'"{nt_escape(lexical)}"'
    if lang:
        return f"{body}@{lang}"
    if datatype:
        return f"{body}^^<{datatype}>"
    return body


def format_bnode(label: str) -> str:
    return f"_:{label}"


def collection_bnode_id(subj: str, pred: str, ctype: str, members: list[str]) -> str:
    """Deterministic content-hash blank-node id, replacing the reference's
    Jena structural dedup (MorphBaseMaterializer.scala:104-135): identical
    collections under the same (subject, predicate) collapse to the same id,
    so distributed dropDuplicates gives exactly Jena's set semantics."""
    h = hashlib.md5()
    h.update(subj.encode()); h.update(b"\x00")
    h.update(pred.encode()); h.update(b"\x00")
    h.update(ctype.encode())
    for m in members:
        h.update(b"\x00"); h.update(m.encode())
    return "c" + h.hexdigest()


@dataclass
class CollTerm:
    """An RDF collection/container produced by a term map; expanded into
    rdf:first/rdf:rest or rdf:_n triples at materialization."""
    ctype: str
    members: list  # lexical strings (or nested CollTerm)


# ---------------------------------------------------------------------------
# Iterator + pushDown (logical-source level)
# ---------------------------------------------------------------------------

def compute_pushdown_fields(pushdowns: list[PushDown], doc: Any) -> dict[str, str]:
    """xR2RMLPushDown.generatePushDownFieldsFromObjectNode: top-level field
    access with the _id/$oid special case; values stringified with quotes
    stripped."""
    if not isinstance(doc, dict):
        return {}
    fields = {}
    for pd in pushdowns:
        key = pd.key
        val = doc.get(key)
        if key == "_id" and isinstance(val, dict) and "$oid" in val:
            val = val["$oid"]
        if val is None:
            continue
        if isinstance(val, str):
            fields[pd.target_field] = val.replace('"', "")
        else:
            fields[pd.target_field] = json.dumps(val, separators=(",", ":"),
                                                 ensure_ascii=False).replace('"', "")
    return fields


def insert_pushdown_fields(value: Any, fields: dict[str, str]) -> None:
    """Insert pushed-down fields into an object or every element of an
    array (xR2RMLPushDown.insertPushedDownFieldsIntoJsonNode)."""
    if isinstance(value, dict):
        value.update(fields)
    elif isinstance(value, list):
        for item in value:
            insert_pushdown_fields(item, fields)


def apply_iterator(doc: Any, iterator_path: Optional[JSONPath],
                   pushdowns: list[PushDown]) -> list[Any]:
    """Fan a source document out through rml:iterator, pushing down parent
    fields (MorphMongoDataSourceReader.scala:117-160).  After pushDown, an
    array result is flattened one level (":140-144")."""
    if iterator_path is None:
        return [doc]
    values = iterator_path.evaluate_obj(doc)
    if not pushdowns:
        return values
    fields = compute_pushdown_fields(pushdowns, doc)
    out = []
    for v in values:
        insert_pushdown_fields(v, fields)
        if isinstance(v, list):
            out.extend(v)
        else:
            out.append(v)
    return out


# ---------------------------------------------------------------------------
# Compiled term maps
# ---------------------------------------------------------------------------

def _obj_to_text(v: Any) -> str:
    """Value → string at the object/term boundary: scalars via Java-style
    toString, structures re-serialized to compact JSON
    (JSONPath_PathExpression.scala:54-57)."""
    if isinstance(v, (dict, list)):
        return json.dumps(v, separators=(",", ":"), ensure_ascii=False)
    return to_lexical(v)


def _compile_msp(ref: str, refform: str) -> MixedSyntaxPath:
    # $._id special case: MongoDB ObjectId — read its $oid subfield
    # (MorphMongoDataTranslator.scala:295-300, 367-372)
    if ref == "$._id":
        ref = "$._id.$oid"
    return MixedSyntaxPath(ref, refform)


def _bind_msp_eval(msp: MixedSyntaxPath):
    """Resolve the msp evaluation STRATEGY once at compile time (the
    shape checks are per-path constants; dispatching them per document
    costs real time at 10^7 rows) — bound-callable mirror of
    CompiledTermMap._eval_msp, same semantics branch for branch."""
    if msp.is_pure_jsonpath():
        return msp.steps[0].evaluate_obj
    if msp.is_pure_column():
        col = msp.referenced_column

        def eval_col(doc, _c=col):
            if isinstance(doc, dict):
                v = doc.get(_c)
                return [] if v is None else [v]
            return []
        return eval_col
    if msp.referenced_column is not None:
        col = msp.referenced_column

        def eval_mixed_col(doc, _c=col, _m=msp):
            if isinstance(doc, dict):
                v = doc.get(_c)
                return [] if v is None else _m.evaluate(v)
            return _m.evaluate(doc if isinstance(doc, str)
                               else _obj_to_text(doc))
        return eval_mixed_col

    def eval_mixed(doc, _m=msp):
        return _m.evaluate(doc if isinstance(doc, str) else _obj_to_text(doc))
    return eval_mixed


class CompiledTermMap:
    """A term map pre-compiled for per-document evaluation."""

    __slots__ = ("tm", "cfg", "kind", "collec_tt", "member_tt", "datatype",
                 "language", "lang_msp", "msp", "tpl_msps", "template",
                 "tpl_segments", "nested", "constant_term", "pushdowns",
                 "_msp_eval", "_lang_eval", "_tpl_evals", "_tpl_fast")

    def __init__(self, tm: TermMap, cfg: EngineConfig):
        self.tm = tm
        self.cfg = cfg
        self.kind = tm.kind
        collec_tt, member_tt, datatype, language, language_ref = tm.calculated_props()
        self.collec_tt = collec_tt
        self.member_tt = member_tt
        self.datatype = datatype
        self.language = language
        self.lang_msp = (_compile_msp(language_ref, tm.ref_formulation)
                         if language_ref else None)
        self.pushdowns = tm.pushdowns
        self.msp = None
        self.tpl_msps = None
        self.template = None
        self.nested = None
        self.constant_term = None
        if tm.kind == REFERENCE:
            self.msp = _compile_msp(tm.reference, tm.ref_formulation)
        elif tm.kind == COLUMN:
            self.msp = MixedSyntaxPath(tm.column, NS.REFFORM_COLUMN)
        elif tm.kind == TEMPLATE:
            self.template = tm.template
            groups = get_template_groups(tm.template)
            self.tpl_msps = [_compile_msp(g, tm.ref_formulation) for g in groups]
            self.tpl_segments = compile_template(tm.template)
        elif tm.kind == CONSTANT:
            self.constant_term = tm.constant
        if tm.nested is not None and not tm.nested.is_simple_nested():
            self.nested = CompiledTermMap(tm.nested, cfg)
        # compile-time strategy binding (per-document dispatch removed)
        self._msp_eval = _bind_msp_eval(self.msp) if self.msp is not None \
            else None
        self._lang_eval = _bind_msp_eval(self.lang_msp) \
            if self.lang_msp is not None else None
        self._tpl_evals = [_bind_msp_eval(m) for m in self.tpl_msps] \
            if self.tpl_msps is not None else None
        # fast-template precondition: every group msp is a pure
        # field-chain JSONPath (its evaluator yields at most one value)
        # and segments are compiled
        self._tpl_fast = bool(
            self.tpl_msps is not None and self.tpl_segments is not None
            and all(m.is_pure_jsonpath()
                    and getattr(m.steps[0], "_fields", None) is not None
                    for m in self.tpl_msps))

    # -- evaluation ------------------------------------------------------
    def _eval_msp(self, msp: MixedSyntaxPath, doc: Any) -> list[Any]:
        if msp.is_pure_jsonpath():
            return msp.steps[0].evaluate_obj(doc)
        if msp.is_pure_column():
            # tabular row represented as a dict {column: value}
            if isinstance(doc, dict):
                v = doc.get(msp.referenced_column)
                return [] if v is None else [v]
            return []
        if msp.referenced_column is not None and isinstance(doc, dict):
            # mixed path starting with Column(...): resolve the column on
            # the row dict, then evaluate the rest of the chain on it
            v = doc.get(msp.referenced_column)
            return [] if v is None else msp.evaluate(v)
        return msp.evaluate(doc if isinstance(doc, str) else _obj_to_text(doc))

    def _language_for(self, doc: Any) -> Optional[str]:
        """xrr:languageReference beats rr:language when it yields a value
        (MorphMongoDataTranslator.scala:302-317)."""
        if self._lang_eval is not None:
            tags = self._lang_eval(doc)
            if tags:
                return str(tags[0])
        return self.language

    def translate(self, doc: Any) -> list:
        """Produce the list of terms (lexical strings or CollTerm) for this
        term map on one document — MorphMongoDataTranslator.translateData."""
        if self.kind == CONSTANT:
            return self._translate_constant()
        if self.kind == TEMPLATE:
            return self._translate_template(doc)
        # reference / column
        values = self._msp_eval(doc)
        lang = self._language_for(doc)
        if self.nested is not None:
            # reference-valued term map with a non-simple nested term map:
            # re-iterate inside each value (MorphMongoDataTranslator.scala:323-346)
            if self.pushdowns:
                fields = compute_pushdown_fields(self.pushdowns, doc)
                for v in values:
                    insert_pushdown_fields(v, fields)
            out = []
            for v in values:
                out.extend(self.nested.translate(v))
            if self.collec_tt is not None:
                return [CollTerm(self.collec_tt, out)] if out else []
            return out
        return self._values_to_terms(values, lang)

    def _translate_constant(self) -> list:
        term = self.constant_term
        if term is None:
            return []
        if term[0] == "iri":
            return [format_iri(term[1])]
        if term[0] == "bnode":
            return [format_bnode(term[1])]
        # literal constant: honor explicit datatype/language from the term map
        dt = self.datatype or term[2]
        lang = self.language or term[3]
        return [format_literal(term[1], dt, lang)]

    def _translate_template(self, doc: Any) -> list:
        cfg = self.cfg
        # fast path (compile-time detected): every group is a pure
        # field-chain JSONPath (yields 0..1 values) and this document
        # binds each group to exactly one non-null scalar — the
        # overwhelming majority of template evaluations.  Byte-identical
        # to the generic path below (same _obj_to_text/encode/expand
        # pipeline, same single-combo expansion), minus the per-group
        # list plumbing and the cartesian checks.
        if self._tpl_fast:
            texts = []
            enc = (self.member_tt == NS.RR_IRI
                   and cfg.encode_unsafe_chars_in_db_values)
            for ev in self._tpl_evals:
                vs = ev(doc)
                if not vs or vs[0] is None:
                    break        # missing/null group: generic path
                v = vs[0]
                t = _obj_to_text(v)
                if enc and isinstance(v, str):
                    t = encode_reserved_chars(t)
                texts.append(t)
            else:
                expanded = expand_segments(self.tpl_segments, texts)
                return self._values_to_terms([expanded], self.language)
        replacements = []
        any_nonempty = False
        for ev in self._tpl_evals:
            vals = [v for v in ev(doc) if v is not None]
            texts = []
            for v in vals:
                t = _obj_to_text(v)
                # encodeResvdCharsIfUri (MorphBaseDataTranslator.scala:327-331)
                if (self.member_tt == NS.RR_IRI and isinstance(v, str)
                        and cfg.encode_unsafe_chars_in_db_values):
                    t = encode_reserved_chars(t)
                texts.append(t)
            if texts:
                any_nonempty = True
            replacements.append(texts)
        # all-groups-empty → no term (MorphMongoDataTranslator.scala:385-390)
        if not any_nonempty:
            return []
        segs = self.tpl_segments
        if segs is None:
            expanded = replace_template_groups(self.template, replacements)
        elif all(len(r) == 1 for r in replacements):
            # fast path: single-valued groups (the overwhelming majority)
            expanded = [expand_segments(segs, [r[0] for r in replacements])]
        else:
            expanded = [expand_segments(segs, combo)
                        for combo in cartesian_product(replacements)]
        return self._values_to_terms(expanded, self.language)

    def _values_to_terms(self, values: list[Any], lang: Optional[str]) -> list:
        """translateMultipleValues + optional collection wrap
        (MorphBaseDataTranslator.scala:180-237)."""
        terms = []
        for v in values:
            if v is None:
                continue
            terms.append(self._make_term(v, lang))
        if self.collec_tt is not None:
            return [CollTerm(self.collec_tt, terms)] if terms else []
        return terms

    def _make_term(self, value: Any, lang: Optional[str]) -> str:
        cfg = self.cfg
        tt = self.member_tt
        if tt == NS.RR_IRI:
            iri = _obj_to_text(value).strip()
            if cfg.encode_unsafe_chars_in_uri:
                iri = encode_url(iri)
            return format_iri(iri)
        if tt == NS.RR_BLANKNODE:
            return format_bnode(encode_url(_obj_to_text(value)))
        # literal (MorphBaseDataTranslator.createLiteral :255-285)
        text = _obj_to_text(value)
        if cfg.literal_trim:
            text = text.strip()
        text = encode_literal(text, cfg.encode_literal_quotes)
        dt = self.datatype
        if dt == NS.XSD_DATETIME:
            text = normalize_datetime(text)
        elif dt == NS.XSD_BOOLEAN:
            text = normalize_boolean(text)
        if dt is None and lang is None and cfg.infer_datatypes:
            dt = infer_datatype(value)
        # a language-tagged literal carries no datatype (Jena: language wins,
        # MorphMongoDataTranslator.createLiteralNode)
        return format_literal(text, None if lang else dt, lang)


# ---------------------------------------------------------------------------
# Compiled triples map
# ---------------------------------------------------------------------------

@dataclass
class DocResult:
    """Translation output for one source document."""
    triples: list = field(default_factory=list)        # (s, p, o, g)
    collections: list = field(default_factory=list)    # (s, p, CollTerm, g)
    join_rows: list = field(default_factory=list)      # (rom_id, cond_id, key, s, p, g)


class CompiledTriplesMap:
    """A triples map pre-compiled for batch evaluation.  ``rom_base`` gives
    this TM's refobjectmaps globally unique ids across the mapping doc."""

    def __init__(self, tm: TriplesMap, cfg: EngineConfig, rom_base: int = 0):
        self.tm = tm
        self.cfg = cfg
        self.name = tm.name
        self.subject = CompiledTermMap(tm.subject_map, cfg)
        self.class_uris = [format_iri(c) for c in tm.class_uris]
        self.subject_graphs = [CompiledTermMap(g, cfg) for g in tm.graph_maps]
        # rml:iterator is ignored for Column-formulation (tabular) sources
        # (example_mysql/mapping.ttl:13 "must be ignored")
        self.iterator = JSONPath(tm.logical_source.iterator) \
            if (tm.logical_source.iterator
                and tm.logical_source.ref_formulation != NS.REFFORM_COLUMN) \
            else None
        self.ls_pushdowns = tm.logical_source.pushdowns
        self.poms = []
        rom_id = rom_base
        for pom in tm.predicate_object_maps:
            preds = [CompiledTermMap(pm, cfg) for pm in pom.predicate_maps]
            objs = [CompiledTermMap(om, cfg) for om in pom.object_maps]
            graphs = [CompiledTermMap(g, cfg) for g in pom.graph_maps]
            roms = []
            for rom in pom.ref_object_maps:
                conds = [( _compile_msp(jc.child_ref, tm.logical_source.ref_formulation), )
                         for jc in rom.join_conditions]
                roms.append((rom_id, rom, [c[0] for c in conds]))
                rom_id += 1
            # constant term maps don't depend on the document: evaluate once
            const_preds = ([p for pm in preds for p in pm.translate(None)]
                           if all(pm.kind == CONSTANT for pm in preds) else None)
            const_objs = ([o for om in objs for o in om.translate(None)]
                          if objs and all(om.kind == CONSTANT for om in objs)
                          else None)
            self.poms.append((preds, objs, roms, graphs,
                              const_preds, const_objs))
        self.rom_count = rom_id - rom_base
        self.subject_is_constant = self.subject.kind == CONSTANT

    # ------------------------------------------------------------------
    def iterate(self, doc: Any) -> list[Any]:
        return apply_iterator(doc, self.iterator, self.ls_pushdowns)

    def translate_doc(self, doc: Any) -> DocResult:
        """One iterated document → triples / collections / join keys.
        Mirrors the reference's per-document main loop
        (MorphMongoDataTranslator.scala:90-211)."""
        res = DocResult()
        subjects = self.subject.translate(doc)
        if not subjects:
            return res
        subject_graphs = [g for gm in self.subject_graphs for g in gm.translate(doc)]

        # rdf:type triples (":108-120")
        for cls in self.class_uris:
            for s in subjects:
                if subject_graphs:
                    for g in subject_graphs:
                        res.triples.append((s, RDF_TYPE_IRI, cls, g))
                else:
                    res.triples.append((s, RDF_TYPE_IRI, cls, None))

        triples_append = res.triples.append
        for preds, objs, roms, pom_graph_maps, const_preds, const_objs in self.poms:
            predicates = const_preds if const_preds is not None \
                else [p for pm in preds for p in pm.translate(doc)]
            if not predicates:
                continue
            objects = const_objs if const_objs is not None \
                else [o for om in objs for o in om.translate(doc)]
            if pom_graph_maps or subject_graphs:
                pom_graphs = [g for gm in pom_graph_maps
                              for g in gm.translate(doc)]
                graphs = subject_graphs + pom_graphs or [None]
            else:
                graphs = _DEFAULT_GRAPHS   # graph-less: skip the allocs

            # materializeQuads cross product (MorphBaseMaterializer.scala:159-200)
            if not roms and len(predicates) == 1 and graphs is _DEFAULT_GRAPHS:
                # hot shape: one constant predicate, default graph, no
                # ROM — flat loop, no per-row branch nesting
                p = predicates[0]
                for s in subjects:
                    for o in objects:
                        if isinstance(o, CollTerm):
                            res.collections.append((s, p, o, None))
                        else:
                            triples_append((s, p, o, None))
                continue
            for p in predicates:
                for s in subjects:
                    for o in objects:
                        for g in graphs:
                            if isinstance(o, CollTerm):
                                res.collections.append((s, p, o, g))
                            else:
                                triples_append((s, p, o, g))
                    for rom_id, rom, cond_msps in roms:
                        for cond_id, msp in enumerate(cond_msps):
                            for key in msp_join_keys(msp, doc):
                                for g in graphs:
                                    res.join_rows.append((rom_id, cond_id, key, s, p, g))
        return res

    def parent_rows(self, doc: Any, parent_msps: list) -> list[tuple[int, str, str]]:
        """Parent-side extraction for refobjectmap joins: for each join
        condition evaluate the parent reference, pair every value with every
        subject of this document (MorphMongoDataTranslator.scala:133-160)."""
        subjects = self.subject.translate(doc)
        if not subjects:
            return []
        out = []
        for cond_id, msp in enumerate(parent_msps):
            for key in msp_join_keys(msp, doc):
                for s in subjects:
                    out.append((cond_id, key, s))
        return out


RDF_TYPE_IRI = format_iri(NS.RDF_TYPE)
# shared default-graph list for graph-less POMs (never mutated; the quad
# loops only read it) — one allocation instead of one per POM per item
_DEFAULT_GRAPHS = [None]


def msp_join_keys(msp: MixedSyntaxPath, doc: Any) -> list[str]:
    """Join-condition values, canonicalized so that equality matches the
    reference's Object equality (ints stay ints, '13' != 13)."""
    if msp.is_pure_jsonpath():
        vals = msp.steps[0].evaluate_obj(doc)
    elif msp.is_pure_column() and isinstance(doc, dict):
        v = doc.get(msp.referenced_column)
        vals = [] if v is None else [v]
    elif msp.referenced_column is not None and isinstance(doc, dict):
        # mixed path with a Column(...) head: resolve the cell first, then
        # run the remaining path steps on the cell value
        v = doc.get(msp.referenced_column)
        vals = [] if v is None else msp.evaluate(v)
    else:
        vals = msp.evaluate(doc if isinstance(doc, str) else _obj_to_text(doc))
    out = []
    for v in vals:
        if v is None:
            continue
        out.append(json.dumps(v, separators=(",", ":"), sort_keys=True,
                              ensure_ascii=False))
    return out


# ---------------------------------------------------------------------------
# Collection → triples expansion
# ---------------------------------------------------------------------------

def expand_collection(subj: str, pred: str, coll: CollTerm,
                      graph: Optional[str]) -> tuple[str, list[tuple]]:
    """Expand an RDF collection/container into its member triples with
    deterministic blank-node ids.  Returns (head_bnode_lexical, triples).
    Replaces the reference's Jena list/container construction
    (MorphBaseDataTranslator.scala:110-146)."""
    members = []
    triples: list[tuple] = []
    for m in coll.members:
        if isinstance(m, CollTerm):
            inner_id, inner_triples = expand_collection(subj, pred, m, graph)
            members.append(inner_id)
            triples.extend(inner_triples)
        else:
            members.append(m)
    base = collection_bnode_id(subj, pred, coll.ctype, members)
    head = format_bnode(base)
    if coll.ctype == NS.XRR_RDFLIST:
        triples.append((head, format_iri(NS.RDF_TYPE), format_iri(NS.RDF_LIST), graph))
        node = head
        for i, m in enumerate(members):
            triples.append((node, format_iri(NS.RDF_FIRST), m, graph))
            if i == len(members) - 1:
                triples.append((node, format_iri(NS.RDF_REST),
                                format_iri(NS.RDF_NIL), graph))
            else:
                nxt = format_bnode(f"{base}-{i + 1}")
                triples.append((node, format_iri(NS.RDF_REST), nxt, graph))
                node = nxt
    else:
        ctype_iri = {NS.XRR_RDFBAG: NS.RDF_BAG, NS.XRR_RDFSEQ: NS.RDF_SEQ,
                     NS.XRR_RDFALT: NS.RDF_ALT}[coll.ctype]
        triples.append((head, format_iri(NS.RDF_TYPE), format_iri(ctype_iri), graph))
        for i, m in enumerate(members):
            triples.append((head, format_iri(NS.rdf_li(i + 1)), m, graph))
    return head, triples
