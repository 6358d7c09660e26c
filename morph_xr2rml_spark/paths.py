"""Mixed-syntax path parsing and evaluation.

Reproduces the semantics of the reference's data-element addressing layer:
  - mixed-syntax paths `Column(...)/CSV(...)/TSV(...)/JSONPath(...)/XPath(...)`
    (/root/reference/morph-core/.../path/MixedSyntaxPath.scala:87-97, 147-179,
    222-239);
  - JSONPath evaluation with Jayway-style ALWAYS_RETURN_LIST +
    SUPPRESS_EXCEPTIONS, non-scalar matches re-serialized to JSON text
    (/root/reference/morph-core/.../path/JSONPath_PathExpression.scala:24-26,
    44-67);
  - XPath via a small ElementTree-based subset
    (/root/reference/morph-core/.../path/XPath_PathExpression.scala:49-73);
  - CSV/TSV single-cell access
    (/root/reference/morph-core/.../path/CSV_PathExpression.scala:33-57).

Everything here is pure Python so it can run vectorized inside
pandas/Arrow UDF batches on executors.
"""

from __future__ import annotations

import csv
import io
import json
import re
from typing import Any, Optional

from .namespaces import REFFORM_COLUMN, REFFORM_JSONPATH, REFFORM_XPATH

# ---------------------------------------------------------------------------
# JSONPath
# ---------------------------------------------------------------------------

_STEP_RE = re.compile(
    r"""
      \.\.(?P<deepfield>[A-Za-z0-9_$@-]+|\*)        # recursive descent
    | \.(?P<field>[A-Za-z0-9_$@-]+)                 # dot child
    | \.(?P<dotstar>\*)                             # dot wildcard
    | \[(?P<bracket>[^\]]*)\]                       # bracket expr
""",
    re.VERBOSE,
)


class JSONPath:
    """Compiled JSONPath for the subset used by xR2RML mappings:
    `$`, `.field`, `['field']`, `[n]`, `[*]`, `.*`, `..field`,
    `[start:end:step]`, `['a','b']`, `[0,2]`, and simple filters
    `[?(@.field <op> literal)]` / `[?(@.field)]`."""

    def __init__(self, path: str):
        self.path = path.strip()
        p = self.path
        if p.startswith("$"):
            p = p[1:]
        self.steps: list[tuple] = []
        pos = 0
        while pos < len(p):
            m = _STEP_RE.match(p, pos)
            if m is None:
                raise ValueError(f"Unsupported JSONPath at {p[pos:]!r} in {path!r}")
            pos = m.end()
            if m.group("deepfield") is not None:
                self.steps.append(("deep", m.group("deepfield")))
            elif m.group("field") is not None:
                self.steps.append(("field", m.group("field")))
            elif m.group("dotstar") is not None:
                self.steps.append(("wild",))
            else:
                self.steps.append(self._parse_bracket(m.group("bracket").strip()))
        # fast path for plain field chains ("$.a.b" — the overwhelming
        # majority of mapping references): evaluate_obj walks dict gets
        # directly instead of the generic per-step dispatch loop
        self._fields = tuple(s[1] for s in self.steps) \
            if all(s[0] == "field" for s in self.steps) else None

    @staticmethod
    def _parse_bracket(b: str) -> tuple:
        if b == "*":
            return ("wild",)
        if b.startswith("?"):
            expr = b[1:].strip()
            if expr.startswith("(") and expr.endswith(")"):
                expr = expr[1:-1].strip()
            return ("filter", _parse_filter(expr))
        if ":" in b and not b.startswith(("'", '"')):
            parts = b.split(":")
            def _i(s: str) -> Optional[int]:
                s = s.strip()
                return int(s) if s else None
            start = _i(parts[0])
            stop = _i(parts[1]) if len(parts) > 1 else None
            step = _i(parts[2]) if len(parts) > 2 else None
            return ("slice", start, stop, step)
        items = [x.strip() for x in _split_commas(b)]
        names, idxs = [], []
        for x in items:
            if x.startswith(("'", '"')):
                names.append(x[1:-1])
            elif re.fullmatch(r"-?\d+", x):
                idxs.append(int(x))
            else:
                names.append(x)
        if names and not idxs:
            return ("names", names)
        if idxs and not names:
            return ("idxs", idxs)
        raise ValueError(f"Unsupported bracket expr {b!r}")

    def evaluate_obj(self, doc: Any) -> list[Any]:
        """Evaluate on a parsed JSON value; returns the list of raw matches
        (suppress-exceptions: missing paths yield [])."""
        fields = self._fields
        if fields is not None:
            node = doc
            for f in fields:
                if isinstance(node, dict) and f in node:
                    node = node[f]
                else:
                    return []
            return [node]
        current = [doc]
        for step in self.steps:
            nxt: list[Any] = []
            kind = step[0]
            for node in current:
                if kind == "field":
                    if isinstance(node, dict) and step[1] in node:
                        nxt.append(node[step[1]])
                elif kind == "wild":
                    if isinstance(node, dict):
                        nxt.extend(node.values())
                    elif isinstance(node, list):
                        nxt.extend(node)
                elif kind == "names":
                    if isinstance(node, dict):
                        nxt.extend(node[nm] for nm in step[1] if nm in node)
                elif kind == "idxs":
                    if isinstance(node, list):
                        for i in step[1]:
                            if -len(node) <= i < len(node):
                                nxt.append(node[i])
                elif kind == "slice":
                    if isinstance(node, list):
                        nxt.extend(node[step[1]:step[2]:step[3]])
                elif kind == "filter":
                    seq = node if isinstance(node, list) else [node]
                    nxt.extend(x for x in seq if step[1](x))
                elif kind == "deep":
                    nxt.extend(_deep_scan(node, step[1]))
            current = nxt
        return current

    def evaluate(self, json_text: str) -> list[Any]:
        """Evaluate on a JSON document given as text.  Matches the reference:
        errors are suppressed (empty list), scalar matches keep their JSON
        type, non-scalar matches are re-serialized to compact JSON text
        (JSONPath_PathExpression.scala:54-57)."""
        try:
            doc = json.loads(json_text)
        except (ValueError, TypeError):
            return []
        out = []
        for v in self.evaluate_obj(doc):
            if isinstance(v, (dict, list)):
                out.append(json.dumps(v, separators=(",", ":"), ensure_ascii=False))
            else:
                out.append(v)
        return out


def _deep_scan(node: Any, field: str) -> list[Any]:
    found: list[Any] = []
    if isinstance(node, dict):
        for k, v in node.items():
            if field == "*" or k == field:
                found.append(v)
            found.extend(_deep_scan(v, field))
    elif isinstance(node, list):
        for v in node:
            found.extend(_deep_scan(v, field))
    return found


_FILTER_RE = re.compile(
    r"@\.(?P<field>[A-Za-z0-9_$-]+)\s*(?:(?P<op>==|!=|<=|>=|<|>)\s*(?P<val>.+))?$"
)


def _parse_filter(expr: str):
    m = _FILTER_RE.match(expr.strip())
    if m is None:
        raise ValueError(f"Unsupported JSONPath filter {expr!r}")
    field = m.group("field")
    op = m.group("op")
    if op is None:
        return lambda x: isinstance(x, dict) and field in x
    raw = m.group("val").strip()
    if raw.startswith(("'", '"')):
        val: Any = raw[1:-1]
    elif raw in ("true", "false"):
        val = raw == "true"
    elif raw == "null":
        val = None
    else:
        val = float(raw) if "." in raw else int(raw)
    ops = {
        "==": lambda a: a == val, "!=": lambda a: a != val,
        "<": lambda a: _cmp(a, val, lambda x, y: x < y),
        ">": lambda a: _cmp(a, val, lambda x, y: x > y),
        "<=": lambda a: _cmp(a, val, lambda x, y: x <= y),
        ">=": lambda a: _cmp(a, val, lambda x, y: x >= y),
    }
    fn = ops[op]
    return lambda x: isinstance(x, dict) and field in x and fn(x[field])


def _cmp(a, b, f):
    try:
        return f(a, b)
    except TypeError:
        return False


# ---------------------------------------------------------------------------
# XPath (ElementTree subset: //name, /a/b, attribute @x, text())
# ---------------------------------------------------------------------------

class XPath:
    def __init__(self, path: str):
        self.path = path.strip()

    def evaluate(self, xml_text: str) -> list[Any]:
        import xml.etree.ElementTree as ET
        try:
            root = ET.fromstring(xml_text)
        except ET.ParseError:
            return []
        p = self.path
        attr = None
        m = re.search(r"/@([A-Za-z0-9_:-]+)$", p)
        if m:
            attr = m.group(1)
            p = p[:m.start()]
        if p.startswith("//"):
            etp = ".//" + p[2:]
        elif p.startswith("/"):
            # ElementTree findall is relative to root; strip the leading
            # root element name if present.
            parts = p.strip("/").split("/")
            if parts and parts[0] == root.tag:
                parts = parts[1:]
            etp = "/".join(parts) if parts else "."
        else:
            etp = p
        try:
            elems = root.findall(etp) if etp != "." else [root]
        except SyntaxError:
            return []
        out = []
        for e in elems:
            if attr is not None:
                if attr in e.attrib:
                    out.append(e.attrib[attr])
            else:
                # reference XPath evaluator returns the string value
                out.append("".join(e.itertext()))
        return out


# ---------------------------------------------------------------------------
# CSV / TSV single-cell
# ---------------------------------------------------------------------------

class CSVPath:
    def __init__(self, index: str, delimiter: str = ","):
        self.index = int(index)
        self.delimiter = delimiter

    def evaluate(self, text: str) -> list[Any]:
        try:
            row = next(csv.reader(io.StringIO(text), delimiter=self.delimiter,
                                  skipinitialspace=True))
        except (StopIteration, csv.Error):
            return []
        if 0 <= self.index < len(row):
            return [row[self.index]]
        return []


class ColumnPath:
    """Marker path: the value was already resolved by the source scan
    (Column_PathExpression.scala:15-17 — evaluating it is skipped)."""

    def __init__(self, column: str):
        self.column = column


# ---------------------------------------------------------------------------
# Mixed-syntax path
# ---------------------------------------------------------------------------

_CONSTRUCTOR_RE = re.compile(
    r"(Column|CSV|TSV|JSONPath|XPath)\s*\(((?:[^()\\]|\\.|\([^)]*\))*?)\)", re.DOTALL
)


def _split_commas(s: str) -> list[str]:
    out, cur, depth, q = [], [], 0, None
    for c in s:
        if q:
            cur.append(c)
            if c == q:
                q = None
            continue
        if c in "'\"":
            q = c
            cur.append(c)
        elif c == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            if c in "([":
                depth += 1
            elif c in ")]":
                depth -= 1
            cur.append(c)
    if cur:
        out.append("".join(cur))
    return out


def _unescape_path(s: str) -> str:
    # the reference unescapes \( \) \{ \} \/ inside constructors
    return re.sub(r"\\([(){}/])", r"\1", s)


class MixedSyntaxPath:
    """A chain of typed path constructors evaluated left to right, each step
    fanning out to multiple values (MixedSyntaxPath.scala:87-97, 222-239).

    A raw path with no constructor syntax is typed by the reference
    formulation of the logical source (Column for RDBs, JSONPath for JSON
    documents)."""

    def __init__(self, raw: str, ref_formulation: str = REFFORM_JSONPATH):
        self.raw = raw
        self.ref_formulation = ref_formulation
        self.steps: list[Any] = []
        matches = list(_CONSTRUCTOR_RE.finditer(raw))
        covered = "".join(m.group(0) for m in matches)
        # Heuristic matching the reference regex split: treat as mixed-syntax
        # only if constructors cover the string (separated by '/').
        if matches and len(covered) + (len(matches) - 1) >= len(raw.strip()):
            for m in matches:
                ctor, arg = m.group(1), _unescape_path(m.group(2))
                if ctor == "Column":
                    self.steps.append(ColumnPath(arg))
                elif ctor == "JSONPath":
                    self.steps.append(JSONPath(arg))
                elif ctor == "XPath":
                    self.steps.append(XPath(arg))
                elif ctor == "CSV":
                    self.steps.append(CSVPath(arg, ","))
                elif ctor == "TSV":
                    self.steps.append(CSVPath(arg, "\t"))
        else:
            if ref_formulation == REFFORM_COLUMN:
                self.steps.append(ColumnPath(raw))
            elif ref_formulation == REFFORM_XPATH:
                self.steps.append(XPath(raw))
            else:
                self.steps.append(JSONPath(raw))

    @property
    def referenced_column(self) -> Optional[str]:
        for s in self.steps:
            if isinstance(s, ColumnPath):
                return s.column
        return None

    def is_pure_column(self) -> bool:
        return len(self.steps) == 1 and isinstance(self.steps[0], ColumnPath)

    def is_pure_jsonpath(self) -> bool:
        return len(self.steps) == 1 and isinstance(self.steps[0], JSONPath)

    def evaluate(self, value: Any) -> list[Any]:
        """Evaluate against a document / column value.  If the head step is a
        Column path it is skipped — the caller passes the already-resolved
        column value (MixedSyntaxPath.scala:89-96)."""
        steps = self.steps
        if steps and isinstance(steps[0], ColumnPath):
            steps = steps[1:]
        current = [value]
        for step in steps:
            nxt: list[Any] = []
            for v in current:
                if v is None:
                    continue
                nxt.extend(step.evaluate(v if isinstance(v, str) else json.dumps(v)))
            current = nxt
        return [v for v in current if v is not None]
