"""RDF serialization — the reference's output syntaxes.

The reference serializes its in-memory Jena model in the syntax named by
``output.syntax.rdf`` (Constants.scala:100-107: RDF/XML, RDF/XML-ABBREV,
N-TRIPLE, N-QUAD, TURTLE, N3, JSON-LD; writer
MorphBaseMaterializer.scala:37-68).  The Spark engine's triple terms are
already N-Triples lexical strings, so serializers work from the
(subj, pred, obj[, graph]) strings directly.

Two tiers:

- driver-side pretty writers (``to_turtle`` / ``to_rdfxml`` /
  ``to_jsonld`` …): collect and format — the faithful equivalent of the
  reference's whole-model write, for result-sized graphs.  Deterministic
  output (sorted subjects/predicates/objects), prefix compaction,
  inline blank nodes and RDF-collection syntax like Jena's pretty
  Turtle writer.
- distributed writers (``write_turtle`` / ``write_ntriples_quads``):
  one pass, no driver collect — each output part is a self-contained
  Turtle document (re-declared @prefix headers are legal), so the part
  files concatenate into one valid document.  This is the 100-TB path.

Named graphs: only N-QUAD carries them; the other syntaxes serialize the
default graph, as in the reference (MorphBaseMaterializer.scala:79-80).
"""

from __future__ import annotations

import json
import re
from collections import defaultdict
from typing import Iterable, Optional

from . import namespaces as NS

DEFAULT_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}

_LIT_RE = re.compile(
    r'^"(?P<lex>(?:[^"\\]|\\.)*)"(?:@(?P<lang>[A-Za-z0-9-]+)|\^\^<(?P<dt>[^>]*)>)?$')
# PN_LOCAL approximation: safe characters for a compacted local name
_PN_LOCAL_RE = re.compile(r"^[A-Za-z0-9_]([A-Za-z0-9_.-]*[A-Za-z0-9_-])?$")

# N-Triples escape decoding (inverse of functions/encoding.nt_escape):
# engine terms carry the ESCAPED lexical form; Turtle/N-Triples/N-Quads
# share that syntax, but RDF/XML element text and JSON-LD @value must
# embed the REAL value (Jena's writers do), so those writers decode.
_NT_UNESCAPE_RE = re.compile(
    r"\\(?:u([0-9A-Fa-f]{4})|U([0-9A-Fa-f]{8})|(.))")
_NT_SIMPLE_ESCAPES = {"\\": "\\", '"': '"', "n": "\n", "r": "\r",
                      "t": "\t", "b": "\b", "f": "\f", "'": "'"}


def nt_unescape(s: str) -> str:
    """Decode N-Triples string escapes (\\\\ \\\" \\n \\r \\t \\b \\f
    \\uXXXX \\UXXXXXXXX) to the raw lexical value."""
    if "\\" not in s:
        return s

    def _rep(m: re.Match) -> str:
        if m.group(1):
            return chr(int(m.group(1), 16))
        if m.group(2):
            return chr(int(m.group(2), 16))
        c = m.group(3)
        return _NT_SIMPLE_ESCAPES.get(c, c)

    return _NT_UNESCAPE_RE.sub(_rep, s)


def parse_term(term: str):
    """N-Triples term string → ('iri', v) | ('bnode', label) |
    ('lit', lex, datatype|None, lang|None)."""
    if term.startswith("<") and term.endswith(">"):
        return ("iri", term[1:-1])
    if term.startswith("_:"):
        return ("bnode", term[2:])
    m = _LIT_RE.match(term)
    if m:
        return ("lit", m.group("lex"), m.group("dt"), m.group("lang"))
    # plain value (shouldn't occur in engine output; treat as literal)
    return ("lit", term, None, None)


def compact_iri(iri: str, prefixes: dict[str, str]) -> Optional[str]:
    """prefix:local if some prefix maps and local is PN_LOCAL-safe."""
    best = None
    for p, ns in prefixes.items():
        if iri.startswith(ns) and (best is None or len(ns) > len(prefixes[best])):
            local = iri[len(ns):]
            if _PN_LOCAL_RE.match(local):
                best = p
    if best is None:
        return None
    return f"{best}:{iri[len(prefixes[best]):]}"


def _collect_rows(triples) -> list[tuple]:
    """DataFrame or iterable of row tuples → [(s, p, o)] default graph."""
    if hasattr(triples, "collect"):  # DataFrame
        cols = triples.columns
        rows = triples.collect()
        if "graph" in cols:
            return [(r.subj, r.pred, r.obj) for r in rows
                    if r.graph is None]
        return [(r.subj, r.pred, r.obj) for r in rows]
    out = []
    for r in triples:
        if len(r) >= 4 and r[3] is not None:
            continue
        out.append((r[0], r[1], r[2]))
    return out


# ---------------------------------------------------------------------------
# Turtle / N3 (pretty, driver-side)
# ---------------------------------------------------------------------------

def _turtle_literal(lex: str, dt: Optional[str], lang: Optional[str],
                    prefixes: dict[str, str]) -> str:
    body = f'"{lex}"'
    if lang:
        return f"{body}@{lang}"
    if dt:
        c = compact_iri(dt, prefixes)
        return f"{body}^^{c or f'<{dt}>'}"
    return body


def to_turtle(triples, prefixes: Optional[dict[str, str]] = None) -> str:
    """Deterministic pretty Turtle: prefix header, subjects grouped with
    ';'/',', 'a' for rdf:type, single-referenced blank nodes inlined as
    '[ ... ]', well-formed rdf:first/rest chains as '( ... )' — the same
    shapes Jena's Turtle writer produces for the reference's goldens
    (example_mongo/result2.txt)."""
    prefixes = {**DEFAULT_PREFIXES, **(prefixes or {})}
    rows = _collect_rows(triples)

    by_subj: dict[str, list[tuple[str, str]]] = defaultdict(list)
    obj_refs: dict[str, int] = defaultdict(int)       # bnode term → #uses as obj
    for s, p, o in rows:
        by_subj[s].append((p, o))
        if o.startswith("_:"):
            obj_refs[o] += 1

    rdf_first = f"<{NS.RDF_FIRST}>"
    rdf_rest = f"<{NS.RDF_REST}>"
    rdf_nil = f"<{NS.RDF_NIL}>"
    rdf_type = f"<{NS.RDF_TYPE}>"

    def is_list_node(term: str) -> bool:
        """bnode with exactly one rdf:first + one rdf:rest, nothing else."""
        if not term.startswith("_:") or obj_refs[term] > 1:
            return False
        props = by_subj.get(term, [])
        preds = sorted(p for p, _ in props)
        return preds == sorted([rdf_first, rdf_rest])

    def is_inlinable(term: str) -> bool:
        return (term.startswith("_:") and obj_refs[term] == 1
                and term in by_subj)

    inlined: set[str] = set()

    def term_str(t: str, indent: int) -> str:
        kind = parse_term(t)
        if kind[0] == "iri":
            if kind[1] == NS.RDF_TYPE:
                return "a"
            c = compact_iri(kind[1], prefixes)
            return c or t
        if kind[0] == "lit":
            return _turtle_literal(kind[1], kind[2], kind[3], prefixes)
        # blank node
        if is_list_node(t):
            # walk the whole chain FIRST: only commit the nodes to
            # `inlined` if every tail link is a pure list node (an impure
            # tail falls back to the explicit label form, and a node
            # wrongly left in `inlined` would drop its triples entirely)
            visited = [t]
            elems = []
            cur = t
            ok = True
            while cur != rdf_nil:
                props = dict(by_subj[cur])
                elems.append(props[rdf_first])
                nxt = props[rdf_rest]
                if nxt != rdf_nil and not is_list_node(nxt):
                    ok = False
                    break
                if nxt != rdf_nil:
                    visited.append(nxt)
                cur = nxt
            if not ok:
                return t
            inlined.update(visited)
            return "( " + " ".join(term_str(e, indent) for e in elems) + " )"
        if is_inlinable(t):
            inlined.add(t)
            return "[ " + _pred_objs(t, indent + 1) + " ]"
        return t

    def _pred_objs(subj: str, indent: int) -> str:
        pad = "    " * indent
        groups: dict[str, list[str]] = defaultdict(list)
        for p, o in by_subj[subj]:
            groups[p].append(o)
        # rdf:type first ('a'), then predicates sorted by compacted form
        def pkey(p):
            return (0 if p == rdf_type else 1, term_str(p, indent))
        parts = []
        for p in sorted(groups, key=pkey):
            objs = sorted(term_str(o, indent) for o in groups[p])
            parts.append(f"{term_str(p, indent)} " + ", ".join(objs))
        return (" ;\n" + pad).join(parts)

    lines = []
    for p in sorted(prefixes):
        lines.append(f"@prefix {p}: <{prefixes[p]}> .")
    lines.append("")

    # decide inlining by rendering bnodes on demand; subjects that end up
    # inlined are skipped.  IRIs first (sorted), then remaining bnodes.
    subj_keys = sorted(by_subj, key=lambda s: (s.startswith("_:"), s))
    rendered = []
    for s in subj_keys:
        if s in inlined:
            continue
        body = _pred_objs(s, 1)
        if s in inlined:   # inlining happened while rendering its own body
            continue
        rendered.append((s, body))
    def subj_str(t: str) -> str:
        """Subject-position rendering: bnode labels stay VERBATIM — a
        free-floating rdf:List head must not render as '( ... )' here,
        since its first/rest body is emitted right after (the collection
        form would re-parse as a second, distinct list)."""
        k = parse_term(t)
        if k[0] == "iri":
            return compact_iri(k[1], prefixes) or t
        return t

    for s, body in rendered:
        if s in inlined:
            continue
        lines.append(f"{subj_str(s)}\n    {body} .")
        lines.append("")
    return "\n".join(lines).rstrip() + "\n"


# ---------------------------------------------------------------------------
# RDF/XML (driver-side)
# ---------------------------------------------------------------------------

def _xml_escape(s: str, attr: bool = False) -> str:
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    if attr:
        s = s.replace('"', "&quot;")
    return s


def _split_qname(iri: str, prefixes: dict[str, str],
                 extra: dict[str, str]) -> tuple[str, str]:
    """IRI → (prefix, local) for an XML element name; auto-register an
    ns prefix when none matches (like Jena's RDF/XML writer)."""
    m = re.match(r"^(.*[/#])([A-Za-z_][A-Za-z0-9_.-]*)$", iri)
    if not m:
        raise ValueError(f"IRI not splittable for RDF/XML: {iri}")
    ns, local = m.group(1), m.group(2)
    for p, n in {**prefixes, **extra}.items():
        if n == ns:
            return p, local
    p = f"ns{len(extra)}"
    extra[p] = ns
    return p, local


def to_rdfxml(triples, prefixes: Optional[dict[str, str]] = None) -> str:
    """RDF/XML serialization (rdf:Description form — the reference's
    'RDF/XML' syntax; 'RDF/XML-ABBREV' is accepted and produces the same
    document, which every RDF/XML parser reads identically)."""
    prefixes = {**DEFAULT_PREFIXES, **(prefixes or {})}
    rows = _collect_rows(triples)
    extra: dict[str, str] = {}
    by_subj: dict[str, list[tuple[str, str]]] = defaultdict(list)
    for s, p, o in rows:
        by_subj[s].append((p, o))

    body_parts: list[str] = []
    for s in sorted(by_subj):
        sk = parse_term(s)
        attr = (f'rdf:about="{_xml_escape(sk[1], attr=True)}"'
                if sk[0] == "iri" else
                f'rdf:nodeID="{_xml_escape(sk[1], attr=True)}"')
        props = []
        for p, o in sorted(by_subj[s]):
            pk = parse_term(p)
            pre, local = _split_qname(pk[1], prefixes, extra)
            ok = parse_term(o)
            if ok[0] == "iri":
                props.append(f'    <{pre}:{local} rdf:resource='
                             f'"{_xml_escape(ok[1], attr=True)}"/>')
            elif ok[0] == "bnode":
                props.append(f'    <{pre}:{local} rdf:nodeID='
                             f'"{_xml_escape(ok[1], attr=True)}"/>')
            else:
                _k, lex, dt, lang = ok
                a = ""
                if lang:
                    a = f' xml:lang="{lang}"'
                elif dt:
                    a = f' rdf:datatype="{_xml_escape(dt, attr=True)}"'
                props.append(f"    <{pre}:{local}{a}>"
                             f"{_xml_escape(nt_unescape(lex))}"
                             f"</{pre}:{local}>")
        body_parts.append(f'  <rdf:Description {attr}>\n'
                          + "\n".join(props) + "\n  </rdf:Description>")

    ns_decls = [f'xmlns:{p}="{_xml_escape(n, attr=True)}"'
                for p, n in sorted({**prefixes, **extra}.items())]
    return ('<?xml version="1.0" encoding="UTF-8"?>\n'
            "<rdf:RDF " + "\n         ".join(ns_decls) + ">\n"
            + "\n".join(body_parts) + "\n</rdf:RDF>\n")


# ---------------------------------------------------------------------------
# JSON-LD (driver-side, flat @graph form)
# ---------------------------------------------------------------------------

def to_jsonld(triples) -> str:
    rows = _collect_rows(triples)
    nodes: dict[str, dict] = {}
    for s, p, o in rows:
        sk = parse_term(s)
        sid = sk[1] if sk[0] == "iri" else f"_:{sk[1]}"
        node = nodes.setdefault(sid, {"@id": sid})
        pk = parse_term(p)
        ok = parse_term(o)
        if pk[1] == NS.RDF_TYPE and ok[0] == "iri":
            node.setdefault("@type", []).append(ok[1])
            continue
        if ok[0] == "iri":
            val: object = {"@id": ok[1]}
        elif ok[0] == "bnode":
            val = {"@id": f"_:{ok[1]}"}
        else:
            _k, lex, dt, lang = ok
            lex = nt_unescape(lex)
            if lang:
                val = {"@value": lex, "@language": lang}
            elif dt:
                val = {"@value": lex, "@type": dt}
            else:
                val = {"@value": lex}
        node.setdefault(pk[1], []).append(val)
    graph = [nodes[k] for k in sorted(nodes)]
    return json.dumps({"@graph": graph}, indent=2, sort_keys=True)


# ---------------------------------------------------------------------------
# N-Triples / N-Quads text (driver-side strings)
# ---------------------------------------------------------------------------

def to_ntriples(triples) -> str:
    rows = _collect_rows(triples)
    return "".join(f"{s} {p} {o} .\n" for s, p, o in sorted(rows))


def to_nquads(triples) -> str:
    """All graphs; default-graph rows as triples, named-graph rows as
    quads (the only syntax that keeps rr:graphMap output)."""
    if hasattr(triples, "collect"):
        cols = triples.columns
        raw = [(r.subj, r.pred, r.obj,
                r.graph if "graph" in cols else None)
               for r in triples.collect()]
    else:
        raw = [(r[0], r[1], r[2], r[3] if len(r) > 3 else None)
               for r in triples]
    out = []
    for s, p, o, g in sorted(raw, key=lambda x: (x[0], x[1], x[2], x[3] or "")):
        out.append(f"{s} {p} {o} {g} .\n" if g else f"{s} {p} {o} .\n")
    return "".join(out)


# ---------------------------------------------------------------------------
# Distributed writers (the scale path: no driver collect)
# ---------------------------------------------------------------------------

def write_turtle(triples_df, path: str,
                 prefixes: Optional[dict[str, str]] = None) -> None:
    """Distributed Turtle: repartition by subject, group each subject's
    triples with ';' inside the partition, emit a @prefix header per
    part file (Turtle allows re-declaration, so concatenated parts form
    one valid document).  No bnode inlining — labels stay explicit,
    which is valid Turtle and keeps the writer one-pass."""
    from pyspark.sql import functions as F
    prefixes = {**DEFAULT_PREFIXES, **(prefixes or {})}
    header = "".join(f"@prefix {p}: <{prefixes[p]}> .\n"
                     for p in sorted(prefixes))
    pref_items = sorted(prefixes.items(), key=lambda kv: -len(kv[1]))

    def fmt_partition(rows):
        def term(t: str) -> str:
            k = parse_term(t)
            if k[0] == "iri":
                if k[1] == NS.RDF_TYPE:
                    return "a"
                for p, ns in pref_items:
                    if k[1].startswith(ns) and _PN_LOCAL_RE.match(k[1][len(ns):]):
                        return f"{p}:{k[1][len(ns):]}"
                return t
            if k[0] == "lit" and k[2]:
                for p, ns in pref_items:
                    if k[2].startswith(ns) and _PN_LOCAL_RE.match(k[2][len(ns):]):
                        return f'"{k[1]}"^^{p}:{k[2][len(ns):]}'
            return t

        first = True
        cur_subj = None
        buf: list[str] = []
        for r in rows:
            if first:
                yield header
                first = False
            if r.subj != cur_subj:
                if buf:
                    yield " ;\n    ".join(buf) + " .\n"
                cur_subj = r.subj
                buf = [f"{term(r.subj)}\n    {term(r.pred)} {term(r.obj)}"]
            else:
                buf.append(f"{term(r.pred)} {term(r.obj)}")
        if buf:
            yield " ;\n    ".join(buf) + " .\n"

    df = triples_df.where(F.col("graph").isNull()) \
        if "graph" in triples_df.columns else triples_df
    (df.select("subj", "pred", "obj")
       .repartition(F.col("subj"))
       .sortWithinPartitions("subj", "pred", "obj")
       .rdd.mapPartitions(fmt_partition)
       .saveAsTextFile(path))


def serialize(triples, syntax: str = "TURTLE",
              prefixes: Optional[dict[str, str]] = None) -> str:
    """Dispatch on the reference's syntax names (Constants.scala:100-107)."""
    s = syntax.upper()
    if s in ("TURTLE", "N3"):
        return to_turtle(triples, prefixes)
    if s in ("RDF/XML", "RDF/XML-ABBREV"):
        return to_rdfxml(triples, prefixes)
    if s == "JSON-LD":
        return to_jsonld(triples)
    if s in ("N-TRIPLE", "N-TRIPLES"):
        return to_ntriples(triples)
    if s in ("N-QUAD", "N-QUADS", "NQUADS"):
        return to_nquads(triples)
    raise ValueError(f"unsupported RDF output syntax {syntax!r}")
