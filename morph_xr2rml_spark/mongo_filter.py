"""Tiny MongoDB find() filter support.

The reference passes the find filter verbatim to MongoDB
(MongoDBQuery.scala:67-90); our engine evaluates the (small) filter
language that actually occurs in mappings: {}, {field: value},
{field: {$exists: b}}, {$and: [...]}, {field: {$eq/$ne/$gt/$gte/$lt/$lte: v}},
dotted field paths.  Filters are compiled once; where possible the Spark
compiler translates them to native Column predicates so they push down.
"""

from __future__ import annotations

import json
import re
from typing import Any, Callable

_SINGLE_QUOTED = re.compile(r"'((?:[^'\\]|\\.)*)'")
_UNQUOTED_KEY = re.compile(r"([{,]\s*)([$A-Za-z_][$\w.]*)(\s*:)")


def normalize_filter_text(text: str) -> str:
    """Mongo-shell-style filter → strict JSON."""
    text = text.strip()
    if not text:
        return "{}"
    text = _SINGLE_QUOTED.sub(lambda m: json.dumps(m.group(1)), text)
    text = _UNQUOTED_KEY.sub(r'\1"\2"\3', text)
    return text


def parse_filter(text: str) -> dict:
    return json.loads(normalize_filter_text(text))


def _get_path(doc: Any, path: str) -> tuple[bool, Any]:
    cur = doc
    for part in path.split("."):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        else:
            return False, None
    return True, cur


def compile_filter(spec: dict) -> Callable[[Any], bool]:
    """Compile a parsed filter dict into a doc predicate."""
    conds: list[Callable[[Any], bool]] = []
    for key, val in spec.items():
        if key == "$and":
            subs = [compile_filter(s) for s in val]
            conds.append(lambda d, subs=subs: all(f(d) for f in subs))
        elif key == "$or":
            subs = [compile_filter(s) for s in val]
            conds.append(lambda d, subs=subs: any(f(d) for f in subs))
        elif isinstance(val, dict) and any(k.startswith("$") for k in val):
            for op, operand in val.items():
                if op == "$exists":
                    want = bool(operand)
                    conds.append(lambda d, k=key, w=want: _get_path(d, k)[0] == w)
                elif op == "$eq":
                    conds.append(lambda d, k=key, v=operand: _get_path(d, k) == (True, v))
                elif op == "$ne":
                    conds.append(lambda d, k=key, v=operand: _get_path(d, k) != (True, v))
                elif op == "$in":
                    conds.append(lambda d, k=key, vs=tuple(operand):
                                 _get_path(d, k)[0] and _get_path(d, k)[1] in vs)
                elif op in ("$gt", "$gte", "$lt", "$lte"):
                    import operator
                    f = {"$gt": operator.gt, "$gte": operator.ge,
                         "$lt": operator.lt, "$lte": operator.le}[op]
                    def cmp(d, k=key, v=operand, f=f):
                        ok, x = _get_path(d, k)
                        if not ok:
                            return False
                        try:
                            return f(x, v)
                        except TypeError:
                            return False
                    conds.append(cmp)
                else:
                    raise ValueError(f"Unsupported Mongo operator {op!r}")
        else:
            conds.append(lambda d, k=key, v=val: _get_path(d, k) == (True, v))
    return lambda d: all(f(d) for f in conds)
