"""Minimal JSON Schema validator for the subset the engine emits.

Used (a) as the property-test oracle — the reference's strongest test is
"a derived schema validates its own source instance"
(RandomValidSpec.scala:35-70, via fge json-schema-validator) — and (b) by
the second-pass constraint suite to produce violation rows for documents
that do not conform to an inferred/expected schema.

Supports: type (string or list), properties + additionalProperties,
items, minimum/maximum, minLength/maxLength, enum, pattern. ``format`` is
annotation-only, as in common validator defaults.
"""

from __future__ import annotations

import re
from typing import Any, List

from schema_guru_spark.core.context import enum_key


def _type_of(value: Any) -> str:
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, dict):
        return "object"
    if isinstance(value, list):
        return "array"
    if isinstance(value, str):
        return "string"
    if isinstance(value, int):
        return "integer"
    if isinstance(value, float):
        return "number"
    if value is None:
        return "null"
    return "unknown"


def validate(value: Any, schema: dict, path: str = "$") -> List[str]:
    """Return a list of violation messages; empty list == valid.
    ``{}`` validates anything (RandomValidSpec.scala:53-59)."""
    errors: List[str] = []
    if not schema:
        return errors

    t = schema.get("type")
    vt = _type_of(value)
    if t is not None:
        allowed = t if isinstance(t, list) else [t]
        # JSON Schema: an integer instance satisfies "number"
        ok = vt in allowed or (vt == "integer" and "number" in allowed)
        if not ok:
            return [f"{path}: type {vt} not in {allowed}"]

    if "enum" in schema and schema["enum"] is not None:
        keys = {enum_key(v) for v in schema["enum"]}
        # JSON Schema numeric equality is MATHEMATICAL (1 == 1.0), both
        # ways: an int instance satisfies a float enum value AND an
        # integral float instance satisfies an int enum value. Guard
        # the float(value) widening for ints beyond float precision
        # (2**53): is_integer() on the exact float path is still exact.
        ok = enum_key(value) in keys
        if not ok and isinstance(value, (int, float)) \
                and not isinstance(value, bool):
            if isinstance(value, int):
                try:
                    f = float(value)
                except OverflowError:
                    f = None  # beyond float range: no float twin exists
                ok = f is not None and int(f) == value and enum_key(f) in keys
            elif value.is_integer():
                ok = enum_key(int(value)) in keys
        if not ok:
            errors.append(f"{path}: value not in enum")

    if vt == "object" and "properties" in schema:
        props = schema["properties"]
        for k, v in value.items():
            if k in props:
                errors.extend(validate(v, props[k], f"{path}.{k}"))
            elif schema.get("additionalProperties") is False:
                errors.append(f"{path}: additional property {k!r}")
    elif vt == "array" and "items" in schema:
        for i, elem in enumerate(value):
            errors.extend(validate(elem, schema["items"], f"{path}[{i}]"))
    elif vt == "string":
        if "minLength" in schema and len(value) < schema["minLength"]:
            errors.append(f"{path}: shorter than minLength")
        if "maxLength" in schema and len(value) > schema["maxLength"]:
            errors.append(f"{path}: longer than maxLength")
        if "pattern" in schema and not re.search(schema["pattern"], value):
            errors.append(f"{path}: pattern mismatch")
    elif vt in ("integer", "number") and not isinstance(value, bool):
        if "minimum" in schema and value < schema["minimum"]:
            errors.append(f"{path}: below minimum")
        if "maximum" in schema and value > schema["maximum"]:
            errors.append(f"{path}: above maximum")

    return errors


def is_valid(value: Any, schema: dict) -> bool:
    return not validate(value, schema)
