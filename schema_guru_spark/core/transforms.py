"""Post-aggregation transform passes — the reference's optimizer-like stage.

Applied in fixed order after the global merge (SchemaGuru.scala:74-78,
SchemaGuruRDD.scala:91-97):

    encase_numeric_range -> correct_max_lengths -> substitute_enums

each recursing through obj/arr/product nodes and rewriting scalar leaves
(SchemaWithTransform.scala:21-30). The reference never applies a transform
to the ROOT node itself (ObjectSchema.transform maps over properties), but
since all transforms target scalar slots this is equivalent.
"""

from __future__ import annotations

from typing import Callable, Optional

from schema_guru_spark.core.context import SchemaContext

INT16_MIN, INT16_MAX = -32768, 32767
INT32_MIN, INT32_MAX = -2147483648, 2147483647
INT64_MIN, INT64_MAX = -9223372036854775808, 9223372036854775807

# Sorted by size (Helpers.scala:156-163).
RANGES = (
    (0, INT16_MAX),
    (INT16_MIN, INT16_MAX),
    (0, INT32_MAX),
    (INT32_MIN, INT32_MAX),
    (0, INT64_MAX),
    (INT64_MIN, INT64_MAX),
)


def guess_range(mn: Optional[int], mx: Optional[int]):
    """Pick the smallest predefined range containing [mn, mx]
    (Helpers.scala:175-182): both known -> containing range; only max
    known -> smallest max bound that fits (min stays None); otherwise
    blank (None, None)."""
    if mn is not None and mx is not None:
        for lo, hi in RANGES:
            if lo <= mn and hi >= mx:
                return lo, hi
        return None, None
    if mn is None and mx is not None:
        for _, hi in RANGES:
            if hi >= mx:
                return None, hi
        return None, None
    return None, None


def _walk(schema: dict, f: Callable[[str, dict], dict]) -> dict:
    """Apply f(kind, state) to every scalar leaf, recursing through
    obj/arr (and product slots). Non-destructive."""
    out = {}
    for kind, state in schema.items():
        if kind == "obj":
            out["obj"] = {"props": {k: _walk(v, f) for k, v in state["props"].items()}}
        elif kind == "arr":
            out["arr"] = {"items": _walk(state["items"], f)}
        elif kind in ("str", "int", "num"):
            out[kind] = f(kind, state)
        else:
            out[kind] = state
    return out


def encase_numeric_range(schema: dict, ctx: SchemaContext) -> dict:
    """T1 (Helpers.scala:186-201): integers snapped to the smallest
    predefined Int16/32/64 range; numbers get min -> 0.0 when observed
    min >= 0 else None, and max -> None always."""

    def f(kind, state):
        if kind == "int":
            lo, hi = guess_range(state["min"], state["max"])
            return {**state, "min": lo, "max": hi}
        if kind == "num":
            mn = state["min"]
            return {**state,
                    "min": 0.0 if (mn is not None and mn >= 0) else None,
                    "max": None}
        return state

    return _walk(schema, f)


def correct_max_lengths(schema: dict, ctx: SchemaContext) -> dict:
    """T2 (Helpers.scala:115-125): for strings that HAVE both a format and
    a maxLength, fix maxLength to the format's canonical width."""
    widths = {"ipv4": 15, "ipv6": 39, "uri": 8192}

    def f(kind, state):
        if (kind == "str" and state["format"] in widths
                and state["max_len"] is not None):
            return {**state, "max_len": widths[state["format"]]}
        return state

    return _walk(schema, f)


def substitute_enums(schema: dict, ctx: SchemaContext) -> dict:
    """T3 (Helpers.scala:94-107): replace an observed enum with the first
    predefined superset."""

    def f(kind, state):
        if state.get("enum") is not None:
            full = ctx.get_predefined_enum(state["enum"])
            if full is not None:
                return {**state, "enum": full}
        return state

    return _walk(schema, f)


def apply_transforms(schema: dict, ctx: SchemaContext) -> dict:
    """The fixed pipeline (SchemaGuru.scala:74-78)."""
    schema = encase_numeric_range(schema, ctx)
    schema = correct_max_lengths(schema, ctx)
    schema = substitute_enums(schema, ctx)
    return schema


def extract_keys(schema: dict) -> set:
    """All object property keys anywhere in the schema
    (Helpers.scala:133-142 — obj: own keys + recurse; arr: recurse items;
    product: obj and arr slots only)."""
    keys: set = set()
    if "obj" in schema:
        props = schema["obj"]["props"]
        keys |= set(props.keys())
        for v in props.values():
            keys |= extract_keys(v)
    if "arr" in schema:
        keys |= extract_keys(schema["arr"]["items"])
    return keys
