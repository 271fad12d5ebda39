"""Port of IntegerRangeReduceSpec.scala:23-64 + transform passes T1-T3."""

from schema_guru_spark.core.context import SchemaContext
from schema_guru_spark.core.transforms import (
    INT16_MAX, INT16_MIN, INT32_MAX, INT32_MIN, INT64_MAX, INT64_MIN,
    apply_transforms, correct_max_lengths, encase_numeric_range, extract_keys,
    guess_range,
)

CTX = SchemaContext.make(0)


def test_guess_zero_as_positive():
    assert guess_range(0, 0)[0] == 0


def test_guess_int16():
    assert guess_range(-1, 31000) == (INT16_MIN, INT16_MAX)


def test_guess_negative_int32():
    assert guess_range(-34000, 3000) == (INT32_MIN, INT32_MAX)


def test_guess_int64():
    assert guess_range(-34000, INT64_MAX - 1) == (INT64_MIN, INT64_MAX)


def test_range_constants():
    assert (INT16_MIN, INT16_MAX) == (-32768, 32767)
    assert (INT32_MIN, INT32_MAX) == (-2147483648, 2147483647)
    assert (INT64_MIN, INT64_MAX) == (-9223372036854775808, 9223372036854775807)


def test_guess_only_max():
    # Helpers.scala:178-179: min unknown -> fit by max only
    assert guess_range(None, 100) == (None, INT16_MAX)
    assert guess_range(None, 40000) == (None, INT32_MAX)


def test_guess_unknown():
    assert guess_range(None, None) == (None, None)
    assert guess_range(5, None) == (None, None)


def test_encase_integer():
    sch = {"obj": {"props": {"n": {"int": {"min": 3, "max": 900, "enum": None}}}}}
    out = encase_numeric_range(sch, CTX)
    assert out["obj"]["props"]["n"]["int"]["min"] == 0
    assert out["obj"]["props"]["n"]["int"]["max"] == INT16_MAX


def test_encase_number():
    # Helpers.scala:192-201: number min>=0 -> 0, else None; max always None
    pos = {"num": {"min": 1.5, "max": 9.5, "enum": None}}
    neg = {"num": {"min": -1.5, "max": 9.5, "enum": None}}
    assert encase_numeric_range(pos, CTX)["num"] == {"min": 0.0, "max": None, "enum": None}
    assert encase_numeric_range(neg, CTX)["num"] == {"min": None, "max": None, "enum": None}


def test_correct_max_lengths():
    # Helpers.scala:115-125 — only applies when format AND maxLength present
    s = {"str": {"format": "ipv4", "pattern": None, "min_len": 7, "max_len": 15,
                 "enum": None}}
    assert correct_max_lengths(s, CTX)["str"]["max_len"] == 15
    s2 = {"str": {"format": "uri", "pattern": None, "min_len": 7, "max_len": 40,
                  "enum": None}}
    assert correct_max_lengths(s2, CTX)["str"]["max_len"] == 8192
    no_len = {"str": {"format": "uri", "pattern": None, "min_len": None,
                      "max_len": None, "enum": None}}
    assert correct_max_lengths(no_len, CTX)["str"]["max_len"] is None


def test_transform_pipeline_recurses_arrays_and_products():
    sch = {
        "arr": {"items": {
            "int": {"min": 1, "max": 2, "enum": None},
            "str": {"format": "ipv6", "pattern": None, "min_len": 3,
                    "max_len": 30, "enum": None},
        }},
    }
    out = apply_transforms(sch, CTX)
    assert out["arr"]["items"]["int"]["max"] == INT16_MAX
    assert out["arr"]["items"]["str"]["max_len"] == 39


def test_extract_keys():
    # JsonObjectAnnotatorSpec-style: all nested object keys
    sch = {"obj": {"props": {
        "a": {"obj": {"props": {"b": {"int": {"min": 1, "max": 1, "enum": None}}}}},
        "c": {"arr": {"items": {"obj": {"props": {"d": {"null": True}}}}}},
    }}}
    assert extract_keys(sch) == {"a", "b", "c", "d"}
