"""Minimal Turtle parser — just enough for xR2RML mapping documents.

The reference parses mappings with Jena
(/root/reference/morph-xr2rml-lang/.../R2RMLMappingDocument.scala:212-252);
we only need the Turtle subset used by mapping files: @prefix/@base,
IRIs, prefixed names, blank-node property lists, object lists,
predicate lists, string literals (single/triple quoted), numeric and
boolean literals, language tags and datatyped literals, and RDF
collections.

Terms are represented as plain tuples:
    ("iri", value)
    ("bnode", label)
    ("lit", lexical, datatype_or_None, lang_or_None)
"""

from __future__ import annotations

import re
from typing import Iterator, Optional

from .namespaces import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, XSD

Term = tuple

_TOKEN_RE = re.compile(
    r"""
      (?P<COMMENT>\#[^\n]*)
    | (?P<TRIPLE_STR>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<STR>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
    | (?P<IRIREF><[^<>"{}|^`\\\s]*>)
    | (?P<PREFIX_DECL>@prefix|@base|PREFIX|BASE)
    | (?P<LANGTAG>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
    | (?P<DOUBLE_CARET>\^\^)
    | (?P<NUMBER>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<BNODE_LABEL>_:[A-Za-z0-9_][A-Za-z0-9_.-]*)
    | (?P<PNAME>[A-Za-z][A-Za-z0-9_.-]*)?:(?P<PNLOCAL>[A-Za-z0-9_](?:[A-Za-z0-9_.%-]*[A-Za-z0-9_%-])?)?
    | (?P<KEYWORD_A>\ba\b)
    | (?P<TRUE>\btrue\b)
    | (?P<FALSE>\bfalse\b)
    | (?P<PUNCT>[;,.\[\]()])
    | (?P<WS>[\s]+)
""",
    re.VERBOSE,
)

_ESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n == "u" and i + 5 < len(s):
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            if n == "U" and i + 9 < len(s):
                out.append(chr(int(s[i + 2:i + 10], 16)))
                i += 10
                continue
            if n in _ESCAPES:
                out.append(_ESCAPES[n])
                i += 2
                continue
            # Jena is lenient with unknown escapes in the reference mapping
            # files (e.g. "\#" inside strings); keep the escaped char.
            out.append(n)
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


class _Tok:
    __slots__ = ("kind", "value")

    def __init__(self, kind: str, value: str):
        self.kind = kind
        self.value = value

    def __repr__(self):  # pragma: no cover
        return f"Tok({self.kind},{self.value!r})"


def _tokenize(text: str) -> Iterator[_Tok]:
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise ValueError(f"Turtle tokenize error at offset {pos}: {text[pos:pos+40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("WS", "COMMENT"):
            continue
        if kind == "PNLOCAL" or kind == "PNAME" or kind is None:
            # the PNAME regex has two named groups; reconstruct the full match
            yield _Tok("PNAME", m.group(0))
            continue
        yield _Tok(kind, m.group(0))
    yield _Tok("EOF", "")


class Graph:
    """A tiny in-memory triple store with the handful of accessors the
    mapping-model builder needs."""

    def __init__(self):
        self.triples: list[tuple[Term, Term, Term]] = []
        self.prefixes: dict[str, str] = {}

    def add(self, s: Term, p: Term, o: Term) -> None:
        self.triples.append((s, p, o))

    def objects(self, s: Term, p_iri: str) -> list[Term]:
        return [o for (s2, p2, o) in self.triples if s2 == s and p2 == ("iri", p_iri)]

    def object(self, s: Term, p_iri: str) -> Optional[Term]:
        objs = self.objects(s, p_iri)
        return objs[0] if objs else None

    def value(self, s: Term, p_iri: str) -> Optional[str]:
        """Lexical value of the first matching object (literal or IRI)."""
        o = self.object(s, p_iri)
        if o is None:
            return None
        return o[1]

    def subjects_of_type(self, type_iri: str) -> list[Term]:
        return [s for (s, p, o) in self.triples
                if p == ("iri", RDF_TYPE) and o == ("iri", type_iri)]

    def subjects_with_property(self, p_iri: str) -> list[Term]:
        seen, out = set(), []
        for (s, p, _o) in self.triples:
            if p == ("iri", p_iri) and s not in seen:
                seen.add(s)
                out.append(s)
        return out

    def predicates(self, s: Term) -> list[str]:
        return [p[1] for (s2, p, _o) in self.triples if s2 == s]


class _Parser:
    def __init__(self, text: str, base: str = ""):
        self.toks = list(_tokenize(text))
        self.i = 0
        self.graph = Graph()
        self.base = base
        self._bnode_ctr = 0

    # --- token helpers -------------------------------------------------
    def peek(self) -> _Tok:
        return self.toks[self.i]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, value: str | None = None) -> _Tok:
        t = self.next()
        if t.kind != kind or (value is not None and t.value != value):
            raise ValueError(f"Turtle parse error: expected {kind} {value!r}, got {t!r}")
        return t

    def _new_bnode(self) -> Term:
        self._bnode_ctr += 1
        return ("bnode", f"gen{self._bnode_ctr}")

    # --- grammar --------------------------------------------------------
    def parse(self) -> Graph:
        while self.peek().kind != "EOF":
            t = self.peek()
            if t.kind == "PREFIX_DECL":
                self._directive()
            else:
                self._triples_block()
        return self.graph

    def _directive(self) -> None:
        t = self.next()
        if t.value in ("@prefix", "PREFIX"):
            pname = self.expect("PNAME").value
            prefix = pname[:-1] if pname.endswith(":") else pname.split(":")[0]
            iri = self.expect("IRIREF").value[1:-1]
            self.graph.prefixes[prefix] = iri
        else:  # @base / BASE
            self.base = self.expect("IRIREF").value[1:-1]
        if t.value.startswith("@"):
            self.expect("PUNCT", ".")

    def _triples_block(self) -> None:
        subj = self._subject()
        self._predicate_object_list(subj)
        self.expect("PUNCT", ".")

    def _subject(self) -> Term:
        t = self.peek()
        if t.kind == "PUNCT" and t.value == "[":
            return self._bnode_property_list()
        if t.kind == "PUNCT" and t.value == "(":
            return self._collection()
        return self._iri_or_bnode()

    def _iri_or_bnode(self) -> Term:
        t = self.next()
        if t.kind == "IRIREF":
            iri = t.value[1:-1]
            if iri.startswith("#") or (self.base and not re.match(r"^[a-z][a-z0-9+.-]*:", iri, re.I)):
                iri = self.base + iri
            return ("iri", iri)
        if t.kind == "PNAME":
            prefix, _, local = t.value.partition(":")
            if prefix not in self.graph.prefixes:
                raise ValueError(f"Unknown prefix {prefix!r} in {t.value!r}")
            return ("iri", self.graph.prefixes[prefix] + local)
        if t.kind == "BNODE_LABEL":
            return ("bnode", t.value[2:])
        raise ValueError(f"Turtle parse error: expected IRI/bnode, got {t!r}")

    def _predicate_object_list(self, subj: Term) -> None:
        while True:
            t = self.peek()
            if t.kind == "KEYWORD_A":
                self.next()
                pred: Term = ("iri", RDF_TYPE)
            elif t.kind in ("IRIREF", "PNAME"):
                pred = self._iri_or_bnode()
            else:
                break
            self._object_list(subj, pred)
            if self.peek().kind == "PUNCT" and self.peek().value == ";":
                while self.peek().kind == "PUNCT" and self.peek().value == ";":
                    self.next()
                continue
            break

    def _object_list(self, subj: Term, pred: Term) -> None:
        while True:
            obj = self._object()
            self.graph.add(subj, pred, obj)
            if self.peek().kind == "PUNCT" and self.peek().value == ",":
                self.next()
                continue
            break

    def _object(self) -> Term:
        t = self.peek()
        if t.kind == "PUNCT" and t.value == "[":
            return self._bnode_property_list()
        if t.kind == "PUNCT" and t.value == "(":
            return self._collection()
        if t.kind in ("TRIPLE_STR", "STR"):
            return self._literal()
        if t.kind == "NUMBER":
            self.next()
            dt = XSD + ("integer" if re.fullmatch(r"[+-]?\d+", t.value) else
                        "decimal" if "e" not in t.value.lower() else "double")
            return ("lit", t.value, dt, None)
        if t.kind == "TRUE" or t.kind == "FALSE":
            self.next()
            return ("lit", t.value, XSD + "boolean", None)
        return self._iri_or_bnode()

    def _literal(self) -> Term:
        t = self.next()
        raw = t.value
        if t.kind == "TRIPLE_STR":
            lexical = _unescape(raw[3:-3])
        else:
            lexical = _unescape(raw[1:-1])
        nxt = self.peek()
        if nxt.kind == "LANGTAG":
            self.next()
            return ("lit", lexical, None, nxt.value[1:])
        if nxt.kind == "DOUBLE_CARET":
            self.next()
            dt = self._iri_or_bnode()
            return ("lit", lexical, dt[1], None)
        return ("lit", lexical, None, None)

    def _bnode_property_list(self) -> Term:
        self.expect("PUNCT", "[")
        node = self._new_bnode()
        if not (self.peek().kind == "PUNCT" and self.peek().value == "]"):
            self._predicate_object_list(node)
        self.expect("PUNCT", "]")
        return node

    def _collection(self) -> Term:
        self.expect("PUNCT", "(")
        items = []
        while not (self.peek().kind == "PUNCT" and self.peek().value == ")"):
            items.append(self._object())
        self.expect("PUNCT", ")")
        if not items:
            return ("iri", RDF_NIL)
        head = self._new_bnode()
        cur = head
        for idx, item in enumerate(items):
            self.graph.add(cur, ("iri", RDF_FIRST), item)
            if idx == len(items) - 1:
                self.graph.add(cur, ("iri", RDF_REST), ("iri", RDF_NIL))
            else:
                nxt = self._new_bnode()
                self.graph.add(cur, ("iri", RDF_REST), nxt)
                cur = nxt
        return head


def parse_turtle(text: str, base: str = "") -> Graph:
    return _Parser(text, base).parse()


def parse_turtle_file(path: str, base: str = "") -> Graph:
    with open(path, "r", encoding="utf-8") as f:
        return parse_turtle(f.read(), base)
