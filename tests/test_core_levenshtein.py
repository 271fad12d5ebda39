"""Port of DuplicatedKeysSpec.scala:22-75."""

from schema_guru_spark.core.levenshtein import (
    calculate_distance,
    cross_product,
    get_duplicates,
)


def test_distance_cases():
    assert calculate_distance("someKey", "somekey") == 1
    assert calculate_distance("someKey", "some_Key") == 1
    assert calculate_distance("sameKey", "sameKey") == 0


def test_cross_product_short_keys_empty():
    assert cross_product({"aaa"}, {"bbbb"}) == set()


def test_cross_product_one_and_two_keys():
    assert cross_product({"aaaa"}, {"bbbb", "cccc"}) == {
        ("aaaa", "bbbb"), ("aaaa", "cccc")}


def test_snake_and_camel_cases():
    assert get_duplicates({"differentCase", "different_case"}) == {
        ("differentCase", "different_case")}


def test_skip_short_keys():
    assert get_duplicates({"short", "sho"}) == set()


def test_one_typo():
    assert get_duplicates({"oneTypo", "oneType"}) == {("oneType", "oneTypo")}


def test_two_typos_skipped():
    assert get_duplicates({"twoTypos", "twoTyped"}) == set()


def test_typos_in_three_keys():
    assert get_duplicates({"oneTypo", "oneType", "oneTipo"}) == {
        ("oneType", "oneTypo"), ("oneTipo", "oneTypo")}
