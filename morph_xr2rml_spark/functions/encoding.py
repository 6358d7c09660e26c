"""IRI / literal encoding, byte-for-byte compatible with the reference
(/root/reference/morph-core/.../GeneralUtility.scala:20-173).

Replacement ORDER matters and is preserved exactly — e.g. '%' is encoded
first in encode_reserved_chars, and encode_literal's backslash replacement
runs before (and therefore shadows) the '\\n'/'\\r' rules, as in the
reference.
"""

from __future__ import annotations

import re

# GeneralUtility.encodeUrl (":75-104"): URL special chars '#' '?' '/' ':' '&'
# and '%' are intentionally NOT encoded.
_ENCODE_URL = [
    (" ", "%20"), ("!", "%21"), ('"', "%22"), ("$", "%24"), ("'", "%27"),
    ("(", "%28"), (")", "%29"), ("*", "%2A"), ("+", "%2B"), (",", "%2C"),
    (";", "%3B"), ("<", "%3C"), ("=", "%3D"), (">", "%3E"), ("@", "%40"),
    ("^", "%5E"), ("[", "%5B"), ("\\", "%5C"), ("]", "%5D"), ("`", "%60"),
    ("{", "%7B"), ("|", "%7C"), ("}", "%7D"), ("~", "%7E"),
]

# GeneralUtility.encodeReservedChars (":109-144"): '%' kept in first place.
_ENCODE_RESERVED = [
    ("%", "%25"),
    (" ", "%20"), ("!", "%21"), ('"', "%22"), ("#", "%23"), ("$", "%24"),
    ("&", "%26"), ("'", "%27"), ("(", "%28"), (")", "%29"), ("*", "%2A"),
    ("+", "%2B"), (",", "%2C"), ("/", "%2F"), (":", "%3A"), (";", "%3B"),
    ("<", "%3C"), ("=", "%3D"), (">", "%3E"), ("?", "%3F"), ("@", "%40"),
    ("^", "%5E"), ("[", "%5B"), ("\\", "%5C"), ("]", "%5D"), ("`", "%60"),
    ("{", "%7B"), ("|", "%7C"), ("}", "%7D"), ("~", "%7E"),
]


# fast paths: one scan decides whether any replacement can apply at all —
# the overwhelmingly common case (keys, digits, plain names) skips the
# whole replace chain
_URL_UNSAFE = re.compile(r"[ !\"$'()*+,;<=>@^\[\\\]`{|}~]")
_RESERVED_UNSAFE = re.compile(r"[%\s!\"#$&'()*+,/:;<=>?@^\[\\\]`{|}~]")


def encode_url(value: str | None) -> str | None:
    if value is None:
        return None
    if _URL_UNSAFE.search(value) is None:
        return value
    for old, new in _ENCODE_URL:
        value = value.replace(old, new)
    return value


def encode_reserved_chars(value: str | None) -> str | None:
    if value is None:
        return None
    if _RESERVED_UNSAFE.search(value) is None:
        return value
    for old, new in _ENCODE_RESERVED:
        value = value.replace(old, new)
    return value


_MULTI_UNDERSCORE = re.compile(r"_{2,}")
_LITERAL_UNSAFE = re.compile(r"[\\\"\n\r]|__")


def encode_literal(value: str | None, encode_quotes: bool = False) -> str | None:
    """GeneralUtility.encodeLiteral (":20-40").  The reference replaces
    backslashes with '/' FIRST, which makes its later '\\n'/'\\r'/'\\ '
    rules dead code — reproduced faithfully.

    encode_quotes: the reference's CURRENT code maps '"' → '%22', but its
    shipped golden outputs (result1-4.txt — the P/R target) contain raw
    quotes, i.e. they predate that rule.  Default False = golden-faithful;
    True = current-code-faithful."""
    if value is None:
        return None
    if _LITERAL_UNSAFE.search(value) is None:
        return value
    value = value.replace("\\", "/")
    if encode_quotes:
        value = value.replace('"', "%22")
    # reference: replaceAll("\\\\n"," ") etc. can never match after the
    # backslash substitution above — intentionally omitted (dead code).
    value = _MULTI_UNDERSCORE.sub("_", value)
    value = value.replace("\n", "").replace("\r", "")
    return value


def decode_uri(value: str | None) -> str | None:
    """GeneralUtility.decodeURI (":146-173")."""
    if value is None:
        return None
    pairs = [
        ("%20", " "), ("%21", "!"), ("%22", '"'), ("%23", "#"), ("%24", "$"),
        ("%26", "&"), ("%27", "'"), ("%28", "("), ("%29", ")"),
        ("%2A", "*"), ("%2a", "*"), ("%2B", "+"), ("%2b", "+"),
        ("%2C", ","), ("%2c", ","), ("%2D", "-"), ("%2d", "-"),
        ("%2E", "."), ("%2e", "."), ("%2F", "/"), ("%2f", "/"), ("%25", "%"),
    ]
    for old, new in pairs:
        value = value.replace(old, new)
    return value
