"""Scalar function surface (SURVEY.md §2 F1-F9) — Column-expression
builders usable in any DataFrame plan; all JVM-side built-ins."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def uniform_string(c) -> Column:
    """F1 (LevenshteinAnnotator.scala:87-89): strip [-_], lowercase."""
    return F.lower(F.regexp_replace(c, "[-_]", ""))


def levenshtein(a, b) -> Column:
    """F2: built-in edit distance."""
    return F.levenshtein(a, b)


def normalize_segment_key(c) -> Column:
    """F3 (JsonPathExtractorRDD.scala:53-63): slice to 30 chars, replace
    [^a-zA-Z0-9.-] with _, null/blank -> 'unmatched'."""
    return (
        F.when(c.isNull() | (F.trim(c) == ""), F.lit("unmatched"))
        .otherwise(F.regexp_replace(F.substring(c, 1, 30),
                                    "[^a-zA-Z0-9.-]", "_"))
    )


def snakify(c) -> Column:
    """F4 (DdlCommand.scala:349): camelCase -> snake_case."""
    return F.lower(F.regexp_replace(c, "([^A-Z_])([A-Z])", r"$1_$2"))


def json_path(c, path: str) -> Column:
    """F5: JSONPath subset via get_json_object."""
    return F.get_json_object(c, path)


def schemaver_parts(c) -> list:
    """F6 (Common.scala:202-212): model/revision/addition columns."""
    return [
        F.regexp_extract(c, r"^([0-9]+)-([0-9]+)-([0-9]+)$", i)
         .cast("int").alias(name)
        for i, name in ((1, "model"), (2, "revision"), (3, "addition"))
    ]


def sha256_hex(c) -> Column:
    """Per-row content invariant (BASELINE.json input_hint)."""
    return F.sha2(c, 256)

def bind_once(expensive: Column, f) -> Column:
    """Evaluate ``expensive`` ONCE per row and pass the materialized
    value to ``f`` as a lambda variable: get(transform(array(e), f), 0).

    Higher-order functions run interpreted (no codegen, no common-
    subexpression elimination), so a lambda body that captures an
    expensive expression re-evaluates it for EVERY array element — a
    transform building g grams over split(text) pays g regex splits
    per row instead of one (measured 13-18x on the documents table).
    Lambda variables, column attributes, and literals are cheap to
    reference; anything computed (split/regexp/md5/...) must be bound.
    """
    return F.get(F.transform(F.array(expensive), f), 0)
