"""The micro-schema kernel: derive / merge (commutative monoid) / render.

A micro-schema is a schema derived from a SINGLE JSON value that would
validate only that value (reference: SchemaGenerator.scala:152-156,
Common.scala:63-69). The merged schema of a dataset is the monoid sum of
all micro-schemas (Helpers.scala:209-224, SchemaGuru.scala:67-84).

Representation — the "generalized product struct": the reference models
nine node kinds (StringSchema, IntegerSchema, NumberSchema, BooleanSchema,
NullSchema, ObjectSchema, ArraySchema, ProductSchema, ZeroSchema —
schema/types/*.scala); we observe that ProductSchema (one optional slot per
primitive kind, ProductSchema.scala:41-160) is the general case and every
other node is a product with one populated slot. So a schema here is a
plain JSON-serializable dict with keys among

    {"obj", "arr", "str", "int", "num", "bool", "null"}

and the empty dict ``{}`` is ZeroSchema (the monoid identity,
ZeroSchema.scala:27-38). This makes the state picklable/JSON-serializable
for Spark partial aggregation and makes merge trivially slot-wise.

Slot states:
    str : {"format": str|None, "pattern": str|None,
           "min_len": int|None, "max_len": int|None, "enum": list|None}
    int : {"min": int|None, "max": int|None, "enum": list|None}
    num : {"min": float|None, "max": float|None, "enum": list|None}
    bool: True          null: True
    obj : {"props": {key: <schema>}}
    arr : {"items": <schema>}

Merge semantics reproduced exactly (SURVEY.md §1.3 / judged behaviors):
  * min/max bounds are None-ABSORBING: if either side lacks a bound the
    merged bound is None (minOrNone/maxOrNone, JsonSchema.scala:141-152).
  * format/pattern survive only if equal on both sides (eqOrNone,
    JsonSchema.scala:161-163).
  * integer + number -> number with bounds widened to float
    (IntegerSchema.scala:49, NumberSchema.scala:49-62).
  * different kinds -> product (slot union); int and num cannot coexist
    in a product — num erases int (ProductSchema.scala:90-95).
  * enum merge: concatenate; if the CONCATENATED size (pre-distinct) is
    within cardinality keep the distinct union, else keep the raw concat
    if it is a subset of a predefined set, else tombstone to None, which
    absorbs all further merges (SchemaWithEnum.scala:57-70).
  * zero is the identity (ZeroSchema.scala:32-34).

One deliberate divergence: in the reference, product(x, int) merged with
product(x, num) DROPS the integer bounds (ProductSchema.scala:124-159,
``mergeInteger`` returns None for the int slot without folding it into
num) — an order-dependent bug that breaks commutativity and therefore
distributed tree-reduction. We fold int into num (same widening rule as
the non-product path), which is associative+commutative and matches the
result the reference produces when the same documents are merged in
arrival order.
"""

from __future__ import annotations

import json
from typing import Any, Optional, Tuple

from schema_guru_spark.core.context import SchemaContext, distinct
from schema_guru_spark.core.formats import suggest_base64, suggest_format

ZERO: dict = {}

KINDS = ("obj", "arr", "str", "int", "num", "bool", "null")
KIND_TO_JSON_TYPE = {
    "obj": "object", "arr": "array", "str": "string", "int": "integer",
    "num": "number", "bool": "boolean", "null": "null",
}

# ---------------------------------------------------------------------------
# Derivation (reference: SchemaGenerator.scala:54-150 + Annotations 152-275)
# ---------------------------------------------------------------------------


def construct_enum(value: Any, ctx: SchemaContext) -> Optional[list]:
    """Wrap a scalar as a 1-element enum candidate
    (SchemaGenerator.scala:231-240): with cardinality 0 and no predefined
    sets -> no enum; with cardinality > 0 OR value found in a predefined
    set -> [value]; else None."""
    if ctx.enum_cardinality == 0 and not ctx.enum_sets:
        return None
    if ctx.enum_cardinality > 0 or ctx.in_one_of_enums(value):
        return [value]
    return None


def annotate_string(value: str, ctx: SchemaContext) -> dict:
    """SchemaGenerator.scala:246-254."""
    return {
        "format": suggest_format(value),
        "pattern": suggest_base64(value, ctx.quantity),
        "min_len": len(value) if ctx.derive_length else None,
        "max_len": len(value) if ctx.derive_length else None,
        "enum": construct_enum(value, ctx),
    }


def annotate_integer(value: int, ctx: SchemaContext) -> dict:
    """SchemaGenerator.scala:260-261."""
    return {"min": value, "max": value, "enum": construct_enum(value, ctx)}


def annotate_number(value: float, ctx: SchemaContext) -> dict:
    """SchemaGenerator.scala:267-275.

    Signed zero is normalized (-0.0 -> 0.0) before it can enter any
    state: bounds updates keep the first-seen representative on ties
    (strict </>), so two representations of the same value would make
    the merge order-sensitive — the one counterexample to the
    commutative-monoid law the distributed tree-reduction depends on
    (found by the round-5 kernel fuzz; JSON Schema numeric comparison
    is mathematical, so validation semantics are unchanged)."""
    v = float(value)
    if v == 0.0:
        v = 0.0
    return {"min": v, "max": v, "enum": construct_enum(v, ctx)}


def derive_sub(value: Any, ctx: SchemaContext) -> dict:
    """Any JSON value -> micro-schema (subJsonToSchema + list processors,
    SchemaGenerator.scala:66-150). Array element schemas are pre-merged at
    derivation time with the monoid (jArrayListProcessor:136-149)."""
    if isinstance(value, dict):
        return {"obj": {"props": {k: derive_sub(v, ctx) for k, v in value.items()}}}
    if isinstance(value, list):
        items = ZERO
        for elem in value:
            items = merge(items, derive_sub(elem, ctx), ctx)
        return {"arr": {"items": items}}
    if isinstance(value, bool):  # must precede int — Python bool <: int
        return {"bool": True}
    if isinstance(value, str):
        return {"str": annotate_string(value, ctx)}
    if isinstance(value, int):
        return {"int": annotate_integer(value, ctx)}
    if isinstance(value, float):
        return {"num": annotate_number(value, ctx)}
    if value is None:
        return {"null": True}
    raise TypeError(f"not a JSON value: {type(value)!r}")


def derive(value: Any, ctx: SchemaContext) -> Tuple[Optional[dict], Optional[str]]:
    """Top-level gate: only objects and arrays are acceptable instances
    (SchemaGenerator.scala:54-59). Returns (schema, error)."""
    if isinstance(value, (dict, list)):
        return derive_sub(value, ctx), None
    compact = json.dumps(value, separators=(",", ":"))
    return None, (
        "JSON instances must contain only objects or arrays. "
        f"{compact[:32]} is unacceptable"
    )


def derive_text(text: str, ctx: SchemaContext) -> Tuple[Optional[dict], Optional[str]]:
    """Raw text -> micro-schema, with parse-error capture
    (P1, SchemaDerive.scala:159-169). Never raises."""
    try:
        value = json.loads(text)
    except (ValueError, TypeError) as e:
        return None, f"invalid JSON: {e}"
    return derive(value, ctx)


# ---------------------------------------------------------------------------
# Merge algebra (the monoid)
# ---------------------------------------------------------------------------


def _min_or_none(a, b):
    """None-absorbing minimum (JsonSchema.scala:141-152)."""
    return min(a, b) if a is not None and b is not None else None


def _max_or_none(a, b):
    return max(a, b) if a is not None and b is not None else None


def _eq_or_none(a, b):
    """Value survives only when both sides agree (JsonSchema.scala:161-163)."""
    return a if a == b else None


def merge_enums(a: Optional[list], b: Optional[list], ctx: SchemaContext) -> Optional[list]:
    """SchemaWithEnum.scala:57-70, exactly: size check on the concatenation
    BEFORE distinct; over-cardinality keeps the raw concat only when it is
    a subset of a predefined set; otherwise tombstone (None absorbs)."""
    if a is None or b is None:
        return None
    merged = a + b
    if len(merged) <= ctx.enum_cardinality:
        return distinct(merged)
    if ctx.is_predefined_enum(merged):
        return merged
    return None


def _merge_str(a: dict, b: dict, ctx: SchemaContext) -> dict:
    """StringSchema.scala:47-57."""
    return {
        "format": _eq_or_none(a["format"], b["format"]),
        "pattern": _eq_or_none(a["pattern"], b["pattern"]),
        "min_len": _min_or_none(a["min_len"], b["min_len"]),
        "max_len": _max_or_none(a["max_len"], b["max_len"]),
        "enum": merge_enums(a["enum"], b["enum"], ctx),
    }


def _merge_int(a: dict, b: dict, ctx: SchemaContext) -> dict:
    """IntegerSchema.scala:44-50."""
    return {
        "min": _min_or_none(a["min"], b["min"]),
        "max": _max_or_none(a["max"], b["max"]),
        "enum": merge_enums(a["enum"], b["enum"], ctx),
    }


def _merge_num(a: dict, b: dict, ctx: SchemaContext) -> dict:
    """NumberSchema.scala:49-55."""
    return {
        "min": _min_or_none(a["min"], b["min"]),
        "max": _max_or_none(a["max"], b["max"]),
        "enum": merge_enums(a["enum"], b["enum"], ctx),
    }


def _int_as_num(i: dict) -> dict:
    """Widen integer bounds to doubles; enum values stay as observed
    (NumberSchema.scala:54-61)."""
    return {
        "min": float(i["min"]) if i["min"] is not None else None,
        "max": float(i["max"]) if i["max"] is not None else None,
        "enum": i["enum"],
    }


def _merge_obj(a: dict, b: dict, ctx: SchemaContext) -> dict:
    """Key-wise map-union with the monoid: a key on one side only keeps
    its schema; on both sides -> recursive merge (ObjectSchema.scala:39-46,
    scalaz ``properties |+| props``)."""
    props = dict(a["props"])
    for k, v in b["props"].items():
        props[k] = merge(props[k], v, ctx) if k in props else v
    return {"props": props}


def _merge_arr(a: dict, b: dict, ctx: SchemaContext) -> dict:
    """ArraySchema.scala:34-36."""
    return {"items": merge(a["items"], b["items"], ctx)}


_MERGERS = {
    "str": _merge_str, "int": _merge_int, "num": _merge_num,
    "obj": _merge_obj, "arr": _merge_arr,
    "bool": lambda a, b, ctx: True, "null": lambda a, b, ctx: True,
}


def _merge_strict(a: dict, b: dict, ctx: SchemaContext) -> dict:
    """Reference-parity product merge (``strict_reference_product``):
    ``a`` is the RECEIVER (``this`` in ``a.merge(b)``), and the int/num
    interplay follows ProductSchema.scala:80-159 exactly:

      * pure ⊕ product delegates with the product as receiver
        (mergeToProduct, JsonSchema.scala:83-85: ``prod.merge(this)``).
      * product ⊕ product (mergeSameType + mergeInteger): if the
        receiver has a number slot, the int slot tombstones; the
        argument's integer folds into the numbers ONLY when the argument
        also has a number slot — otherwise the argument's integer bounds
        are silently LOST (the order-dependent reference behavior the
        default mode deliberately fixes).
      * product ⊕ pure int/num (the ``case int:`` / ``case num:``
        branches): folding widening, int slot erased when a number
        exists on either side.
      * pure ⊕ pure: int⊕num widens commutatively
        (IntegerSchema.scala:49, NumberSchema.scala:49-62).

    Consequently int and num CAN coexist in a strict-mode product
    (receiver without num merged with argument carrying num), and the
    operation is NOT commutative — pinned by tests/test_strict_product.py.

    Sub-merge receiver order (matters because nested products make the
    sub-merges themselves order-dependent):

      * product ⊕ product (mergeSameType): ``mergeWithOption(other.slot,
        this.slot)`` calls ``this.slot.mergeSameType(other.slot)`` — the
        RECEIVER's slot is the sub-receiver (ProductSchema.scala:68-77,
        124-129).
      * product ⊕ pure (ProductSchema.merge's case obj/arr/str):
        ``obj.merge(this.objectSchema)`` — the PURE ARGUMENT is the
        sub-receiver (ProductSchema.scala:83-88). The same holds after
        the mergeToProduct delegation (pure ⊕ product), since both
        routes land in ProductSchema.merge with the pure side as
        argument.
    """
    a_prod, b_prod = len(a) > 1, len(b) > 1
    if b_prod and not a_prod:
        return _merge_strict(b, a, ctx)
    # product ⊕ pure: the pure side (b) is the receiver of every slot
    # sub-merge; all other cases keep the outer receiver's slot first
    pure_arg = a_prod and not b_prod
    out: dict = {}
    for kind in ("obj", "arr", "str", "bool", "null"):
        ina, inb = kind in a, kind in b
        if ina and inb:
            out[kind] = (_MERGERS[kind](b[kind], a[kind], ctx) if pure_arg
                         else _MERGERS[kind](a[kind], b[kind], ctx))
        elif ina:
            out[kind] = a[kind]
        elif inb:
            out[kind] = b[kind]
    a_int, a_num = a.get("int"), a.get("num")
    b_int, b_num = b.get("int"), b.get("num")
    if not a_prod:                      # both pure: commutative widening
        if a_int is not None and b_num is not None:
            out["num"] = _merge_num(_int_as_num(a_int), b_num, ctx)
        elif a_num is not None and b_int is not None:
            out["num"] = _merge_num(a_num, _int_as_num(b_int), ctx)
        else:
            if a_int is not None or b_int is not None:
                out["int"] = _merge_int(a_int, b_int, ctx) \
                    if (a_int is not None and b_int is not None) \
                    else (a_int if a_int is not None else b_int)
            if a_num is not None or b_num is not None:
                out["num"] = _merge_num(a_num, b_num, ctx) \
                    if (a_num is not None and b_num is not None) \
                    else (a_num if a_num is not None else b_num)
    elif b_prod:                        # product ⊕ product, receiver a
        if a_num is not None:
            if b_num is not None:       # argument int folds in (:154-157)
                folded = _merge_num(_int_as_num(b_int), a_num, ctx) \
                    if b_int is not None else a_num
                out["num"] = _merge_num(b_num, folded, ctx)
            else:                       # argument int LOST (:146-149)
                out["num"] = a_num
        else:
            if a_int is not None or b_int is not None:
                out["int"] = _merge_int(a_int, b_int, ctx) \
                    if (a_int is not None and b_int is not None) \
                    else (a_int if a_int is not None else b_int)
            if b_num is not None:
                out["num"] = b_num
    else:                               # receiver product, argument pure
        if b_int is not None:           # case int: (:90-94)
            if a_num is not None:
                out["num"] = _merge_num(_int_as_num(b_int), a_num, ctx)
            elif a_int is not None:
                out["int"] = _merge_int(b_int, a_int, ctx)
            else:
                out["int"] = b_int
        elif b_num is not None:         # case num: (:95-96) — folds a.int
            m = _merge_num(b_num, a_num, ctx) if a_num is not None else b_num
            if a_int is not None:
                m = _merge_num(m, _int_as_num(a_int), ctx)
            out["num"] = m
        else:
            if a_int is not None:
                out["int"] = a_int
            if a_num is not None:
                out["num"] = a_num
    return out


def merge(a: dict, b: dict, ctx: SchemaContext) -> dict:
    """The monoid append: slot-wise merge of two product structs, then the
    int/num coexistence rule (JsonSchema.scala:116-118 dispatch collapsed
    into one slot-wise pass; ProductSchema.scala:80-102). Associative and
    commutative; ``ZERO`` ({}) is the identity.

    With ``ctx.strict_reference_product`` the int/num handling instead
    reproduces the reference's order-dependent product semantics — see
    ``_merge_strict``.
    """
    if not a:
        return b
    if not b:
        return a
    if ctx.strict_reference_product:
        return _merge_strict(a, b, ctx)
    out: dict = {}
    for kind in KINDS:
        ina, inb = kind in a, kind in b
        if ina and inb:
            out[kind] = _MERGERS[kind](a[kind], b[kind], ctx)
        elif ina:
            out[kind] = a[kind]
        elif inb:
            out[kind] = b[kind]
    if "int" in out and "num" in out:
        # number erases integer inside a product (ProductSchema.scala:90-95),
        # with the integer folded in via widening (see module docstring).
        out["num"] = _merge_num(_int_as_num(out["int"]), out["num"], ctx)
        del out["int"]
    return out


def merge_all(schemas, ctx: SchemaContext) -> dict:
    """suml (SchemaGuru.scala:71) / RDD.reduce (SchemaGuruRDD.scala:89)."""
    acc = ZERO
    for s in schemas:
        acc = merge(acc, s, ctx)
    return acc


# ---------------------------------------------------------------------------
# Rendering to JSON Schema (the *.toJson methods of each type)
# ---------------------------------------------------------------------------


def _render_scalar(kind: str, state, ctx: SchemaContext) -> dict:
    if kind == "bool":
        return {"type": "boolean"}
    if kind == "null":
        return {"type": "null"}
    if kind == "str":
        out: dict = {"type": "string"}
        if state["format"] is not None:
            out["format"] = state["format"]
        if state["pattern"] is not None:
            out["pattern"] = state["pattern"]
        if state["min_len"] is not None:
            out["minLength"] = state["min_len"]
        if state["max_len"] is not None:
            out["maxLength"] = state["max_len"]
        if state["enum"] is not None:
            out["enum"] = list(state["enum"])
        return out
    if kind == "int":
        out = {"type": "integer"}
        if state["max"] is not None:
            out["maximum"] = state["max"]
        if state["min"] is not None:
            out["minimum"] = state["min"]
        if state["enum"] is not None:
            out["enum"] = list(state["enum"])
        return out
    if kind == "num":
        out = {"type": "number"}
        if state["max"] is not None:
            out["maximum"] = state["max"]
        if state["min"] is not None:
            # 0.0 renders as integer 0 (NumberSchema.scala:44-46 transform)
            out["minimum"] = 0 if state["min"] == 0.0 else state["min"]
        if state["enum"] is not None:
            out["enum"] = list(state["enum"])
        return out
    raise ValueError(kind)


def render(schema: dict, ctx: Optional[SchemaContext] = None) -> dict:
    """Schema state -> JSON Schema dict.

    Zero -> {} (ZeroSchema.scala:30). Single kind -> that type's toJson.
    Multiple kinds -> product render: subtype JSONs merged in slot order
    with later fields overriding (ProductSchema.toJson fold,
    ProductSchema.scala:56-66), ``type`` a list, ``enum`` the concatenation
    of subtype enums."""
    ctx = ctx or SchemaContext()
    if not schema:
        return {}
    kinds = [k for k in KINDS if k in schema]
    if len(kinds) == 1:
        k = kinds[0]
        if k == "obj":
            return {
                "type": "object",
                "properties": {
                    key: render(v, ctx) for key, v in schema["obj"]["props"].items()
                },
                "additionalProperties": False,
            }
        if k == "arr":
            return {"type": "array", "items": render(schema["arr"]["items"], ctx)}
        return _render_scalar(k, schema[k], ctx)
    # product
    merged: dict = {}
    enums: list = []
    enum_present = False
    for k in kinds:
        sub = (
            {"type": "object",
             "properties": {key: render(v, ctx)
                            for key, v in schema["obj"]["props"].items()},
             "additionalProperties": False}
            if k == "obj"
            else {"type": "array", "items": render(schema["arr"]["items"], ctx)}
            if k == "arr"
            else _render_scalar(k, schema[k], ctx)
        )
        e = sub.pop("enum", None)
        if e is not None:
            enum_present = True
            enums = e + enums  # reference reduce order: later types first
        sub.pop("type", None)
        merged.update(sub)
    merged["type"] = [KIND_TO_JSON_TYPE[k] for k in kinds]
    if enum_present:
        merged["enum"] = enums
    return merged


# ---------------------------------------------------------------------------
# Serialization for Spark partial aggregation (BinaryType/StringType columns)
# ---------------------------------------------------------------------------


def dumps(schema: dict) -> str:
    """State -> compact JSON. The state is pure JSON data by construction
    (float/int/bool/str/None survive a round-trip distinctly)."""
    return json.dumps(schema, separators=(",", ":"), sort_keys=True)


def loads(s: str) -> dict:
    return json.loads(s)
