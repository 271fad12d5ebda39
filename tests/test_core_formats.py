"""Port of StringFormatAnnotationSpec.scala:19-60 and
StringPatternAnnotationSpec.scala:22-58."""

import pandas as pd

from schema_guru_spark.core.context import SchemaContext
from schema_guru_spark.core.formats import (
    BASE64_PATTERN,
    detect_format_series,
    suggest_base64,
    suggest_time,
    suggest_uuid,
)
from schema_guru_spark.core.microschema import annotate_string

CORRECT_UUID = "f0e89550-7fda-11e4-bbe8-22000ad9bf74"
CORRECT_DATE = "2010-01-01T12:00:00+01:00"
CORRECT_URI = "https://github.com/snowplow/schema-guru"
INCORRECT_DATE = "2010-13-01T12:00:00+01:00"
INCORRECT_DATE_AS_NUM = "23"
CORRECT_IP = "192.1.1.2"

CTX0 = SchemaContext.make(0)


def test_recognize_uuid():
    assert suggest_uuid(CORRECT_UUID) == "uuid"


def test_recognize_iso_date():
    assert suggest_time(CORRECT_DATE) == "date-time"


def test_skip_invalid_date():
    assert suggest_time(INCORRECT_DATE) is None


def test_skip_invalid_date_as_number():
    # the len>10 truncation guard (SchemaGenerator.scala:158-167)
    assert suggest_time(INCORRECT_DATE_AS_NUM) is None


def test_annotate_field_with_date():
    assert annotate_string(CORRECT_DATE, CTX0)["format"] == "date-time"


def test_annotate_field_with_ipv4():
    assert annotate_string(CORRECT_IP, CTX0)["format"] == "ipv4"


def test_annotate_field_with_uri():
    assert annotate_string(CORRECT_URI, CTX0)["format"] == "uri"


def test_ipv6():
    assert annotate_string("2001:db8::8a2e:370:7334", CTX0)["format"] == "ipv6"


# --- base64 pattern (StringPatternAnnotationSpec) ---

BASE64 = "aGVsbG8="
LONG_BASE64 = "VGhpcyBzdHJpbmcgc2hvdWxkIGJlIG1vcmUgdGhhbiAzMiBzeW1ib2xzIGluIGJhc2U2NA=="
INCORRECT_BASE64 = "aVsbG="


def test_recognize_base64_on_big_quantity():
    assert suggest_base64(BASE64, 10000) == BASE64_PATTERN


def test_skip_base64_on_small_quantity():
    assert suggest_base64(BASE64, 1) is None


def test_skip_invalid_base64():
    assert suggest_base64(INCORRECT_BASE64, 10000) is None


def test_recognize_long_base64_even_on_small_quantity():
    assert suggest_base64(LONG_BASE64, 1) == BASE64_PATTERN


def test_annotate_field_with_base64():
    ctx = SchemaContext.make(0, quantity=10000)
    assert annotate_string(BASE64, ctx)["pattern"] == BASE64_PATTERN


def test_no_base64_annotation_on_small_quantity():
    ctx = SchemaContext.make(0, quantity=1)
    assert annotate_string(BASE64, ctx)["pattern"] is None


def test_quantity_unknown_always_attempts_base64():
    # the Spark job never sets quantity (SchemaDerive.scala:84) -> base64
    # always attempted (SURVEY.md §3.2 note)
    assert suggest_base64(BASE64, None) == BASE64_PATTERN


# --- vectorized detector agrees with scalar chain ---

def test_vectorized_detector_matches_scalar():
    vals = pd.Series([
        CORRECT_UUID, CORRECT_DATE, INCORRECT_DATE, INCORRECT_DATE_AS_NUM,
        CORRECT_IP, CORRECT_URI, "2001:db8::1", "plain text", "",
        "2010-01-01",  # bare date: excluded by len>10 guard? len==10 -> excluded
    ])
    from schema_guru_spark.core.formats import suggest_format
    got = detect_format_series(vals)
    expected = vals.apply(suggest_format)
    assert list(got.fillna("~")) == list(expected.fillna("~"))
