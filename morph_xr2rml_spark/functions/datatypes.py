"""Datatype inference and lexical-form normalization.

Mirrors:
  - JSON type → XSD datatype inference
    (/root/reference/morph-xr2rml-mongo/.../MorphMongoDataTranslator.scala:403-419);
  - dateTime / boolean lexical normalization
    (/root/reference/morph-base/.../MorphBaseDataTranslator.scala:313-322).
"""

from __future__ import annotations

from typing import Any, Optional

from ..namespaces import XSD_BOOLEAN, XSD_DATETIME, XSD_DECIMAL, XSD_INTEGER


def infer_datatype(value: Any) -> Optional[str]:
    """JSON value type → XSD datatype; None for strings/others."""
    # bool must be checked before int (bool is an int subclass in Python)
    if isinstance(value, bool):
        return XSD_BOOLEAN
    if isinstance(value, int):
        return XSD_INTEGER
    if isinstance(value, float):
        return XSD_DECIMAL
    return None


def to_lexical(value: Any) -> str:
    """Java's .toString for JSON scalar values (booleans lowercase)."""
    if isinstance(value, bool):
        return "true" if value else "false"
    return str(value)


def normalize_datetime(value: str) -> str:
    """xsd:dateTime: ' ' separator → 'T' (MorphBaseDataTranslator.scala:313-315)."""
    return value.strip().replace(" ", "T")


def normalize_boolean(value: str) -> str:
    """xsd:boolean: T/True/1 (case-insensitive) → 'true', else 'false'."""
    if value.lower() in ("t", "true", "1"):
        return "true"
    return "false"
