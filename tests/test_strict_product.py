"""Reference-parity mode for the product int⊕num merge.

ProductSchema.scala:124-159 (`mergeInteger`): in a product⊕product merge
where the RECEIVER carries a number slot, the argument's integer slot is
tombstoned — and its bounds fold into the number ONLY when the argument
also carries a number. With the argument carrying just an integer, those
bounds are silently lost, which makes the reference's merge
order-dependent. The engine default fixes that (folds always,
commutative — required for tree-reduction); `strict_reference_product`
reproduces the reference bit-for-bit. These tests pin the divergence in
BOTH directions.
"""

from schema_guru_spark.core.context import SchemaContext
from schema_guru_spark.core.microschema import ZERO, merge, merge_all

STRICT = SchemaContext.make(0, strict_reference_product=True)
DEFAULT = SchemaContext.make(0)

# products: {str, num} and {str, int} — the divergence trigger
P_NUM = {"str": {"format": None, "pattern": None, "min_len": 1, "max_len": 1,
                 "enum": None},
         "num": {"min": 1.5, "max": 2.5, "enum": None}}
P_INT = {"str": {"format": None, "pattern": None, "min_len": 3, "max_len": 3,
                 "enum": None},
         "int": {"min": 5, "max": 9, "enum": None}}


def test_strict_receiver_num_drops_argument_int():
    # a.merge(b) with a={str,num}, b={str,int}: mergeInteger(b.int) sees
    # this.numberSchema defined -> None; num slot keeps ONLY a's bounds
    out = merge(dict(P_NUM), dict(P_INT), STRICT)
    assert "int" not in out
    assert out["num"] == {"min": 1.5, "max": 2.5, "enum": None}  # 5..9 LOST


def test_strict_is_order_dependent():
    # reversed receiver: b={str,int} has no num slot, so the int survives
    # AND the argument's num lands beside it — int/num coexist
    out = merge(dict(P_INT), dict(P_NUM), STRICT)
    assert out["int"] == {"min": 5, "max": 9, "enum": None}
    assert out["num"] == {"min": 1.5, "max": 2.5, "enum": None}
    assert out != merge(dict(P_NUM), dict(P_INT), STRICT)  # non-commutative


def test_strict_product_product_both_nums_folds_argument_int():
    # argument carries BOTH int and num: ProductSchema.scala:154-157
    # folds its int through the receiver's num before merging nums
    a = {"str": P_NUM["str"], "num": {"min": 1.0, "max": 2.0, "enum": None}}
    b = {"str": P_INT["str"],
         "int": {"min": -5, "max": 50, "enum": None},
         "num": {"min": 0.5, "max": 3.0, "enum": None}}
    out = merge(a, b, STRICT)
    assert "int" not in out
    assert out["num"] == {"min": -5.0, "max": 50.0, "enum": None}


def test_strict_product_pure_int_still_folds():
    # product{str,num} ⊕ PURE int goes through `case int:` — folding
    # widening, NOT the lossy product path (ProductSchema.scala:90-94)
    pure_int = {"int": {"min": 5, "max": 9, "enum": None}}
    out = merge(dict(P_NUM), pure_int, STRICT)
    assert "int" not in out
    assert out["num"] == {"min": 1.5, "max": 9.0, "enum": None}
    # and pure ⊕ product delegates with the product as receiver
    assert merge(pure_int, dict(P_NUM), STRICT) == out


def test_strict_pure_pure_widens_commutatively():
    i = {"int": {"min": 2, "max": 3, "enum": None}}
    n = {"num": {"min": 1.5, "max": 1.5, "enum": None}}
    out = merge(dict(i), dict(n), STRICT)
    assert out == merge(dict(n), dict(i), STRICT)
    assert out == {"num": {"min": 1.5, "max": 3.0, "enum": None}}


def test_default_mode_folds_and_commutes():
    ab = merge(dict(P_NUM), dict(P_INT), DEFAULT)
    ba = merge(dict(P_INT), dict(P_NUM), DEFAULT)
    assert ab == ba
    assert "int" not in ab
    assert ab["num"] == {"min": 1.5, "max": 9.0, "enum": None}


def test_strict_non_numeric_slots_unaffected():
    # str/bool/null/obj/arr merges are identical in both modes
    a = {"str": {"format": "uuid", "pattern": None, "min_len": 36,
                 "max_len": 36, "enum": None}, "bool": True}
    b = {"str": {"format": "uuid", "pattern": None, "min_len": 36,
                 "max_len": 36, "enum": None}, "null": True}
    assert merge(dict(a), dict(b), STRICT) == merge(dict(a), dict(b), DEFAULT)


def test_strict_merge_all_matches_reference_arrival_order():
    # reduce in arrival order: ((zero ⊕ num-prod) ⊕ int-prod) — the
    # receiver accumulates, so the int bounds vanish exactly as the
    # reference's RDD.reduce would make them
    out = merge_all([dict(P_NUM), dict(P_INT)], STRICT)
    assert out["num"] == {"min": 1.5, "max": 2.5, "enum": None}
    assert ZERO == {}


def test_strict_mode_rejected_by_distributed_engine(spark):
    # non-commutative merge must not run under partition/tree order
    import pytest as _pt

    from schema_guru_spark.operators.infer import (
        infer_json_column, infer_json_column_by_key)

    df = spark.createDataFrame([('{"a": 1}', "x")], "props string, k string")
    with _pt.raises(ValueError, match="strict_reference_product"):
        infer_json_column(df, "props", STRICT)
    with _pt.raises(ValueError, match="strict_reference_product"):
        infer_json_column_by_key(df, "props", "k", STRICT)


def test_strict_receiver_with_both_slots_drops_own_int():
    # a receiver product carrying BOTH int and num (a state strict mode
    # itself creates) merged with another product: mergeInteger sees
    # this.numberSchema defined and returns None — the receiver's OWN
    # integer bounds are dropped too (ProductSchema.scala:146-149); the
    # num slot keeps only the number-side merge. Pinned so the parity
    # claim covers the 3-way chain.
    s = merge(dict(P_INT), dict(P_NUM), STRICT)       # {str, int, num}
    assert "int" in s and "num" in s
    out = merge(s, dict(P_INT), STRICT)
    assert "int" not in out                           # both ints gone
    assert out["num"] == {"min": 1.5, "max": 2.5, "enum": None}


def test_strict_product_pure_submerge_receiver_is_pure_side():
    # ProductSchema.scala:83-88 — product ⊕ pure obj sub-merges with the
    # PURE side as receiver (obj.merge(this.objectSchema)). The receiver
    # order is observable when the obj's properties hold nested int/num
    # product states, since strict-mode nested merges are themselves
    # order-dependent: pure-obj-receiver keeps ITS num slot's bounds and
    # drops the product side's nested int bounds.
    nested_num = {"num": {"min": 1.0, "max": 2.0, "enum": None},
                  "str": P_NUM["str"]}            # product {num, str}
    nested_int = {"int": {"min": 10, "max": 20, "enum": None},
                  "str": P_INT["str"]}            # product {int, str}
    prod = {"bool": True, "obj": {"props": {"x": dict(nested_int)}}}
    pure_obj = {"obj": {"props": {"x": dict(nested_num)}}}

    # product.merge(pure): sub-receiver is pure_obj's x = {num,str} ->
    # mergeInteger tombstones the argument's nested int; 10..20 LOST
    out = merge(dict(prod), dict(pure_obj), STRICT)
    x = out["obj"]["props"]["x"]
    assert x["num"] == {"min": 1.0, "max": 2.0, "enum": None}
    assert "int" not in x

    # pure.merge(product) delegates through mergeToProduct
    # (JsonSchema.scala:83-85: prod.merge(this)) — SAME pure-side
    # receiver, same result
    out2 = merge(dict(pure_obj), dict(prod), STRICT)
    assert out2["obj"]["props"]["x"] == x
