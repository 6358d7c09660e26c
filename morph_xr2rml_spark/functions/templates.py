"""R2RML/xR2RML template machinery.

Reproduces /root/reference/morph-core/.../TemplateUtility.scala:
  - getTemplateGroups (":90-117") — extract '{...}' groups, tolerating
    mixed-syntax paths that themselves contain '{' '}';
  - replaceTemplateGroups (":148-202") — expand a template with the
    Cartesian product of per-group value lists (":210-250");
  - compatible_templates (":260-281").

The cartesian enumeration order (last group varies fastest, empty group
lists contribute "" — TemplateUtility.scala:224-227) is preserved.
"""

from __future__ import annotations

import itertools
import re
from typing import Any, Sequence

# Constants.scala:335-354 — a mixed-syntax-path constructor expression
_MIXED_SYNTAX_PATH_RE = re.compile(
    r"(Column|CSV|TSV|JSONPath|XPath)\s*\(((?:[^()\\]|\\.|\([^)]*\))*?)\)",
    re.DOTALL,
)

# Constants.R2RML_TEMPLATE_PATTERN_WITH_CAPTURING_GRP
_TEMPLATE_GROUP_RE = re.compile(r"\{([^{}]+)\}")

_PLACEHOLDER = "xR2RML_replacer"


def get_template_groups(template: str) -> list[str]:
    """List the references of the '{...}' capturing groups of a template."""
    paths = [m.group(0) for m in _MIXED_SYNTAX_PATH_RE.finditer(template)]
    masked = _MIXED_SYNTAX_PATH_RE.sub(_PLACEHOLDER, template)
    groups = []
    for m in _TEMPLATE_GROUP_RE.finditer(masked):
        g = m.group(1)
        # restore the original mixed-syntax paths in order
        while _PLACEHOLDER in g and paths:
            g = g.replace(_PLACEHOLDER, paths.pop(0), 1)
        groups.append(g)
    return groups


def cartesian_product(lists: Sequence[Sequence[Any]]) -> list[list[Any]]:
    """TemplateUtility.cartesianProduct: an empty group list contributes ''
    to every combination (so one empty group doesn't wipe out the rest)."""
    effective = [lst if lst else [""] for lst in lists]
    return [list(combo) for combo in itertools.product(*effective)]


def replace_template_groups(template: str, replacements: Sequence[Sequence[Any]]) -> list[str]:
    """Expand the template's groups with every combination of the
    per-group replacement value lists."""
    if not replacements:
        return [template]
    masked = _MIXED_SYNTAX_PATH_RE.sub(_PLACEHOLDER, template)
    n_groups = len(_TEMPLATE_GROUP_RE.findall(masked))
    if n_groups > len(replacements):
        return [template]
    results = []
    for combo in cartesian_product(replacements):
        it = iter(combo)
        results.append(_TEMPLATE_GROUP_RE.sub(lambda _m: str(next(it)), masked))
    return results


def compile_template(template: str) -> list[str]:
    """Template → fixed segments [fix0, fix1, ..., fixN] around the N
    groups; expansion is then plain string interleaving (the hot path
    avoids regex substitution per call)."""
    paths = [m.group(0) for m in _MIXED_SYNTAX_PATH_RE.finditer(template)]
    masked = _MIXED_SYNTAX_PATH_RE.sub(_PLACEHOLDER, template)
    segments, last = [], 0
    for m in _TEMPLATE_GROUP_RE.finditer(masked):
        segments.append(masked[last:m.start()])
        last = m.end()
    segments.append(masked[last:])
    if paths and any(_PLACEHOLDER in s for s in segments):
        # mixed-syntax path OUTSIDE any group (pathological) — signal the
        # caller to use the generic regex-based expansion instead
        return None
    return segments


def expand_segments(segments: list[str], combo: list[str]) -> str:
    parts = [segments[0]]
    for i, v in enumerate(combo):
        parts.append(v)
        parts.append(segments[i + 1])
    return "".join(parts)


def template_to_regex(template: str) -> re.Pattern:
    """Template → regex with one non-greedy capturing group per '{...}'
    (getTemplateMatching, TemplateUtility.scala:36-69)."""
    masked = _MIXED_SYNTAX_PATH_RE.sub(_PLACEHOLDER, template)
    parts, last = [], 0
    for m in _TEMPLATE_GROUP_RE.finditer(masked):
        parts.append(re.escape(masked[last:m.start()]))
        parts.append("(.+?)")
        last = m.end()
    parts.append(re.escape(masked[last:]))
    return re.compile("^" + "".join(parts) + "$")


def get_template_matching(template: str, uri: str) -> dict[str, str]:
    groups = get_template_groups(template)
    m = template_to_regex(template).match(uri)
    if m is None:
        return {}
    return dict(zip(groups, m.groups()))


def compatible_templates(t1: str, t2: str) -> bool:
    masked1 = _TEMPLATE_GROUP_RE.sub("PLACEHOLDER", _MIXED_SYNTAX_PATH_RE.sub(_PLACEHOLDER, t1))
    masked2 = _TEMPLATE_GROUP_RE.sub("PLACEHOLDER", _MIXED_SYNTAX_PATH_RE.sub(_PLACEHOLDER, t2))
    return masked1 == masked2
