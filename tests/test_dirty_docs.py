"""Dirty-input sweep over the documents-pipeline operators.

The driver fixtures have no NULL/empty text, so nothing ever exercised
the operators on the rows a real 100 TB corpus is full of: NULL text,
empty strings, whitespace-only docs, 1-char docs shorter than any
shingle window. Every operator must either process such rows with
sane outputs or (for pair ops) simply not emit candidates — never
throw from a Python batch fn or produce NULL-poisoned aggregates.

(Same hunt that found the NULL-flag TypeError in the validation scan
pass — tests/test_pipeline.py::test_null_fields_are_violations_not_
crashes.)
"""

import pytest
from pyspark.sql import functions as F

from schema_guru_spark.operators import dedup, textstats


@pytest.fixture(scope="module")
def dirty_docs(spark):
    rows = [
        (0, "The quick brown fox jumps over the lazy dog. " * 20, "web"),
        (1, "The quick brown fox jumps over the lazy dog. " * 20, "web"),
        (2, None, "web"),          # NULL text
        (3, "", "books"),          # empty
        (4, "   \n\t  ", "books"),  # whitespace only
        (5, "a", "web"),           # shorter than any shingle window
        (6, "word " * 3, None),    # NULL source
    ]
    return spark.createDataFrame(
        rows, "id bigint, text string, source string").cache()


def test_token_stats_dirty(dirty_docs):
    out = {r["id"]: r for r in
           textstats.token_stats(dirty_docs, "text", "id").collect()}
    assert len(out) == 7
    assert out[3]["n_ws_tokens"] == 0 and out[4]["n_ws_tokens"] == 0
    # NULL text: stats are NULL (unknown), never a crash
    assert out[2]["n_ws_tokens"] in (None, 0, -1)
    assert out[2]["n_bpe_tokens"] in (None, 0)


def test_quality_scores_dirty(dirty_docs):
    out = {r["id"]: r for r in
           textstats.quality_scores(dirty_docs, "text", "id").collect()}
    assert len(out) == 7
    for i in (0, 1, 3, 4, 5):
        assert out[i]["quality"] is not None
        assert 0.0 <= out[i]["quality"] <= 1.0


def test_lang_id_dirty(dirty_docs):
    out = {r["id"]: r for r in
           textstats.lang_id(dirty_docs, "text", "id").collect()}
    assert len(out) == 7
    assert out[0]["lang_pred"] == "en"


def test_fingerprints_dirty(dirty_docs):
    out = textstats.fingerprints(dirty_docs, "text", "id")
    assert out.count() == 7


def test_pii_scan_dirty(dirty_docs):
    out = {r["id"]: r for r in
           textstats.pii_scan(dirty_docs, "text", "id").collect()}
    assert len(out) == 7


def test_repetition_signals_dirty(dirty_docs):
    out = {r["id"]: r for r in
           textstats.repetition_signals(dirty_docs, "text", "id")
           .collect()}
    assert len(out) == 7
    assert out[0]["dup_3gram_frac"] is not None
    assert out[0]["dup_3gram_frac"] > 0.5  # 20x repeated sentence


def test_exact_duplicates_dirty(dirty_docs):
    out = dedup.exact_duplicates(dirty_docs, "text", "id")
    rows = out.collect()
    # ids 0/1 are exact dups; NULL text must not group with ''
    groups = [sorted(r["ids"]) for r in rows]
    assert [0, 1] in groups
    for g in groups:
        assert not ({2, 3} <= set(g)), "NULL grouped with empty string"


def test_minhash_pairs_dirty(dirty_docs):
    pairs = dedup.minhash_verified_pairs(
        dirty_docs, "id", "text", threshold=0.8).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(0, 1)}


def test_simhash_dirty(dirty_docs):
    fps = dedup.simhash_fingerprints(dirty_docs, "id", "text")
    assert fps.count() == 7
    near = dedup.simhash_near_duplicates(dirty_docs, "id", "text")
    got = {(r["id_a"], r["id_b"]) for r in near.collect()}
    assert (0, 1) in got


def test_ngram_jaccard_dirty(dirty_docs):
    pairs = dedup.ngram_jaccard_pairs(
        dirty_docs, "id", "text", threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(0, 1)}


def test_curation_report_dirty(dirty_docs, spark):
    bench = spark.createDataFrame([("benchmark probe text",)],
                                  "text string")
    out = textstats.curation_report(dirty_docs, "text", "id", bench)
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == 7
    assert rows[0]["keep"] is not None
    # degenerate docs must land in a drop bucket, not NULL verdicts
    for i in (2, 3, 4):
        assert rows[i]["keep"] is not None


def test_source_mix_dirty(dirty_docs):
    out = textstats.source_mix_report(dirty_docs, "text",
                                      "source").collect()
    srcs = {r["source"] for r in out}
    assert "web" in srcs and "books" in srcs
    # NULL source is its own bucket, not dropped
    assert None in srcs or "__null__" in srcs
