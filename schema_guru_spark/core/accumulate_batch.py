"""Columnar batch fold — the next cut on the executor hot path.

``fold_docs(acc, docs, ctx)`` is semantically identical to

    for d in docs: accumulate_doc(acc, d, ctx)

(law pinned by tests/test_core_roundtrip.py, hypothesis-driven exact
dict equality) but transposes each batch of parsed documents into
per-key value columns first, then folds each column with bulk
operations:

  * lengths/min/max over a string column run as one ``map(len)`` +
    C-level ``min``/``max`` instead of a Python branch per value;
  * int/num range updates are one ``min``/``max`` per column;
  * the format/pattern eq-or-none fold short-circuits at the FIRST
    disagreeing value in the column (the per-value kernel can only
    tombstone-skip from the next document on) — on heterogeneous keys
    the whole column's detector work collapses to one mismatch;
  * the per-value recursion survives only for containers, so the
    Python call count drops from O(total JSON leaves) to
    O(distinct keys x batches + containers).

Measured on the synthetic validation doc mix (nested object, ~14
leaves): 1.6x over ``accumulate`` (see BENCH/REGRESSION_r04.md).

DOMAIN: commutative contexts with the enum machinery off
(``ctx.enum_disabled``) — exactly the distributed inference/validation
default (SchemaContext.make(0)). Enum candidates count value
multiplicities through an order-sensitive concat-size check per value,
which a bulk fold cannot reorder safely, so enum-enabled contexts fall
back to the per-value kernel (same results, prior speed). Strict
reference-product contexts are rejected by every distributed entry
point before reaching here (operators/infer.py::_require_commutative).

OWNERSHIP CONTRACT: same as ``accumulate`` — ``acc`` must be
task-private, never aliased.

Reference semantics: the fold is derive+merge per
SchemaGenerator.scala:136-222 / JsonSchema.scala:141-163, composed
over a batch; column order within a batch is immaterial because the
enum-free merge is pointwise associative + commutative.
"""

from __future__ import annotations

from typing import Any

from schema_guru_spark.core.accumulate import accumulate, accumulate_doc
from schema_guru_spark.core.context import SchemaContext
from schema_guru_spark.core.formats import suggest_base64, suggest_format


def fold_docs(acc: dict, docs: list, ctx: SchemaContext) -> dict:
    """Fold a batch of gate-checked documents (each a dict or list)
    into ``acc``. Returns ``acc`` (mutated). Callers gate top-level
    kinds themselves (scalar instances are per-document errors with the
    reference's message — see ``accumulate_doc``)."""
    if not ctx.enum_disabled:
        for d in docs:
            accumulate_doc(acc, d, ctx)
        return acc
    _fold_column(acc, docs, ctx)
    return acc


def _fold_column(acc: dict, vals: list, ctx: SchemaContext) -> None:
    """Fold a column of JSON values (any class mix) into one
    accumulator node."""
    strs: list | None = None
    ints: list | None = None
    dicts: list | None = None
    lists: list | None = None
    floats: list | None = None
    saw_bool = False
    saw_null = False
    for v in vals:
        t = v.__class__
        if t is str:
            if strs is None:
                strs = []
            strs.append(v)
        elif t is dict:
            if dicts is None:
                dicts = []
            dicts.append(v)
        elif t is bool:
            saw_bool = True
        elif t is int:
            if ints is None:
                ints = []
            ints.append(v)
        elif t is list:
            if lists is None:
                lists = []
            lists.append(v)
        elif t is float:
            if floats is None:
                floats = []
            floats.append(v)
        elif v is None:
            saw_null = True
        else:
            # builtin subclass or foreign type: the per-value kernel
            # owns that semantics (coerce-or-TypeError)
            accumulate(acc, v, ctx)
    if strs is not None:
        _fold_strs(acc, strs, ctx)
    if floats is not None:
        # rare in JSON-bearing corpora; int->num widening is stateful
        # (pops the int slot), keep the per-value kernel authoritative
        for v in floats:
            accumulate(acc, v, ctx)
    if ints is not None:
        _fold_ints(acc, ints)
    if saw_bool:
        acc["bool"] = True
    if saw_null:
        acc["null"] = True
    if dicts is not None:
        _fold_dicts(acc, dicts, ctx)
    if lists is not None:
        # enum-off fast path of the per-value kernel (accumulate.py):
        # elements fold straight into the shared items state — the
        # enum-free merge is pointwise assoc+comm, so element order and
        # array boundaries are immaterial
        arr = acc.get("arr")
        if arr is None:
            arr = acc["arr"] = {"items": {}}
        if len(lists) == 1:
            flat = lists[0]
        else:
            flat = []
            for lst in lists:
                flat.extend(lst)
        if flat:
            _fold_column(arr["items"], flat, ctx)


def _fold_dicts(acc: dict, dicts: list, ctx: SchemaContext) -> None:
    obj = acc.get("obj")
    if obj is None:
        obj = acc["obj"] = {"props": {}}
    props = obj["props"]
    cols: dict[Any, list] = {}
    for d in dicts:
        for k, v in d.items():
            b = cols.get(k)
            if b is None:
                b = cols[k] = []
            b.append(v)
    for k, col in cols.items():
        child = props.get(k)
        if child is None:
            child = props[k] = {}
        _fold_column(child, col, ctx)


def _fold_strs(acc: dict, vals: list, ctx: SchemaContext) -> None:
    qty = ctx.quantity
    st = acc.get("str")
    i = 0
    if st is None:
        v0 = vals[0]
        ln0 = len(v0) if ctx.derive_length else None
        st = acc["str"] = {
            "format": suggest_format(v0),
            "pattern": suggest_base64(v0, qty),
            "min_len": ln0, "max_len": ln0,
            "enum": None,  # ctx.enum_disabled on this path
        }
        i = 1
        if len(vals) == 1:
            return
    rest = vals[i:] if i else vals
    if ctx.derive_length:
        # None-absorbing min/max (JsonSchema.scala:141-163): once None
        # (derive_length off elsewhere), stays None
        if st["min_len"] is not None:
            lens = list(map(len, rest))
            mn = min(lens)
            mx = max(lens)
            if mn < st["min_len"]:
                st["min_len"] = mn
            if mx > st["max_len"]:
                st["max_len"] = mx
    else:
        st["min_len"] = None
        st["max_len"] = None
    fmt = st["format"]
    if fmt is not None:
        for v in rest:
            if suggest_format(v) != fmt:
                st["format"] = None
                break
    pat = st["pattern"]
    if pat is not None:
        for v in rest:
            if suggest_base64(v, qty) != pat:
                st["pattern"] = None
                break


def _fold_ints(acc: dict, vals: list) -> None:
    mn = min(vals)
    mx = max(vals)
    num = acc.get("num")
    if num is not None:
        # int ⊕ num -> num, widened (NumberSchema.scala:54-61),
        # None-absorbing bounds
        if num["min"] is not None:
            v = float(mn)
            if v < num["min"]:
                num["min"] = v
        if num["max"] is not None:
            v = float(mx)
            if v > num["max"]:
                num["max"] = v
        return
    it = acc.get("int")
    if it is None:
        acc["int"] = {"min": mn, "max": mx, "enum": None}
        return
    if it["min"] is not None and mn < it["min"]:
        it["min"] = mn
    if it["max"] is not None and mx > it["max"]:
        it["max"] = mx
