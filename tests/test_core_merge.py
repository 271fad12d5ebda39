"""Port of /root/reference/src/test/scala/MergeSpec.scala:26-105 —
the SchemaMerge/TypeEnrichment spec fixtures."""

from schema_guru_spark.core.context import SchemaContext
from schema_guru_spark.core.microschema import ZERO, merge, merge_all, render

CTX = SchemaContext.make(0)


def S(fmt=None, pattern=None, min_len=None, max_len=None, enum=None):
    return {"str": {"format": fmt, "pattern": pattern,
                    "min_len": min_len, "max_len": max_len, "enum": enum}}


def I(mn=None, mx=None, enum=None):
    return {"int": {"min": mn, "max": mx, "enum": enum}}


def N(mn=None, mx=None, enum=None):
    return {"num": {"min": mn, "max": mx, "enum": enum}}


def OBJ(**props):
    return {"obj": {"props": dict(props)}}


def test_maintain_types_in_array():
    # MergeSpec.scala:58-59: string ⊕ integer -> product with both slots
    merged = merge(S(), I(), CTX)
    assert set(merged.keys()) == {"str", "int"}


def test_merge_minimum_values_for_int32():
    # MergeSpec.scala:61-64
    a = OBJ(test_key=I(-2, 3))
    b = OBJ(test_key=I(-34000, 3))
    merged = render(merge(a, b, CTX), CTX)
    assert merged["properties"]["test_key"]["minimum"] == -34000


def test_merge_integer_with_number():
    # MergeSpec.scala:66-69: int ⊕ num -> number
    a = OBJ(test_key=I(-34000, 3))
    b = OBJ(test_key=N(-34000.0, 3.3))
    merged = render(merge(a, b, CTX), CTX)
    assert merged["properties"]["test_key"]["type"] == "number"


def test_merge_distinct_formats():
    # MergeSpec.scala:71-74: uuid vs date-time -> no format
    a = OBJ(test_key=S(fmt="uuid"))
    b = OBJ(test_key=S(fmt="date-time"))
    merged = render(merge(a, b, CTX), CTX)
    assert "format" not in merged["properties"]["test_key"]


def test_merge_format_with_missing():
    # MergeSpec.scala:76-79: format ⊕ no-format -> no format
    a = OBJ(test_key=S())
    b = OBJ(test_key=S(fmt="date-time"))
    merged = render(merge(a, b, CTX), CTX)
    assert "format" not in merged["properties"]["test_key"]


def test_merge_two_different_types_produce_product():
    # MergeSpec.scala:81-84
    a = OBJ(test_key=S(fmt="date-time"))
    b = OBJ(test_key=I(-2, 3))
    merged = render(merge(a, b, CTX), CTX)
    assert sorted(merged["properties"]["test_key"]["type"]) == ["integer", "string"]


def test_product_retains_format():
    # MergeSpec.scala:86-89
    a = OBJ(test_key=S(fmt="date-time"))
    b = OBJ(test_key=I(-2, 3))
    merged = render(merge(a, b, CTX), CTX)
    assert merged["properties"]["test_key"]["format"] == "date-time"


def test_merge_strings_with_max_lengths():
    # MergeSpec.scala:91-94
    merged = render(merge(S(min_len=3, max_len=10), S(min_len=5, max_len=8), CTX), CTX)
    assert merged["maxLength"] == 10


def test_merge_strings_with_min_lengths():
    # MergeSpec.scala:96-99
    merged = render(merge(S(min_len=5, max_len=8), S(min_len=3, max_len=10), CTX), CTX)
    assert merged["minLength"] == 3


def test_merge_product_type_with_max_lengths():
    # MergeSpec.scala:101-104: int ⊕ (str ⊕ str) keeps maxLength in product
    inner = merge(S(min_len=5, max_len=8), S(min_len=3, max_len=10), CTX)
    merged = render(merge(I(), inner, CTX), CTX)
    assert merged["maxLength"] == 10


def test_zero_is_identity():
    # ZeroSchema.scala:32-34 / JsonSchema.scala:104-106
    s = S(fmt="uuid", min_len=3, max_len=3)
    assert merge(ZERO, s, CTX) == s
    assert merge(s, ZERO, CTX) == s
    assert render(ZERO, CTX) == {}


def test_none_absorbing_bounds():
    # JsonSchema.scala:141-152: one side missing a bound -> bound gone
    merged = merge(I(1, 5), I(None, None), CTX)
    assert merged["int"]["min"] is None and merged["int"]["max"] is None


def test_int_num_cannot_coexist_in_product():
    # ProductSchema.scala:90-95 — num erases int, bounds folded (widened)
    prod_int = merge(S(), I(1, 5), CTX)       # product(str, int)
    prod_num = merge(S(), N(0.5, 2.0), CTX)   # product(str, num)
    merged = merge(prod_int, prod_num, CTX)
    assert "int" not in merged
    assert merged["num"]["min"] == 0.5 and merged["num"]["max"] == 5.0


def test_merge_order_insensitive():
    # distributed tree-reduce safety: any merge order, same result
    import itertools
    parts = [OBJ(a=I(1, 1)), OBJ(a=N(2.5, 2.5)), OBJ(b=S(fmt="uuid", min_len=36, max_len=36)),
             OBJ(a=I(-7, -7), b=S(fmt="uuid", min_len=36, max_len=36))]
    results = set()
    for perm in itertools.permutations(parts):
        from schema_guru_spark.core.microschema import dumps
        results.add(dumps(merge_all(perm, CTX)))
    assert len(results) == 1
