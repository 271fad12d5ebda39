"""Text analysis operators."""

import pytest
from pyspark.sql import functions as F

from schema_guru_spark.operators import textstats as TS


@pytest.fixture(scope="module")
def sample(spark):
    rows = [
        (1, "the quick brown fox is on the hill and it runs for fun"),
        (2, "der Hund ist nicht auf der Straße und das Auto ist blau"),
        (3, "le chat est dans la maison et les enfants sont pour toujours"),
        (4, "xyzzy qwerty!!! ### $$$ %%%"),
        (5, "el perro es un animal y la casa es de madera en por"),
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def test_token_stats(spark, sample):
    out = {r["id"]: r for r in TS.token_stats(sample, "text", "id").collect()}
    assert out[1]["n_ws_tokens"] == 13
    assert out[1]["n_chars"] == len("the quick brown fox is on the hill and it runs for fun")
    # BPE-ish: words + punct symbols each count
    assert out[4]["n_bpe_tokens"] > out[4]["n_ws_tokens"]


def test_lang_id(spark, sample):
    out = {r["id"]: r["lang_pred"] for r in
           TS.lang_id(sample, "text", "id").collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[5] == "es"
    assert out[4] == "und"


def test_quality_scores(spark, sample):
    out = {r["id"]: r for r in
           TS.quality_scores(sample, "text", "id").collect()}
    assert out[1]["quality"] > out[4]["quality"]
    assert 0.0 <= out[4]["quality"] <= 1.0
    assert out[1]["stopword_hits"] > 0


def test_fingerprints_stable_and_normalizing(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World  Foo"), (2, "hello world foo"), (3, "other text")],
        ["id", "text"])
    out = {r["id"]: r for r in TS.fingerprints(df, "text", "id").collect()}
    # whitespace/case-normalized digests collide for 1 and 2
    assert out[1]["content_md5"] == out[2]["content_md5"]
    assert out[1]["winnow_min"] == out[2]["winnow_min"]
    assert out[1]["content_md5"] != out[3]["content_md5"]


def test_on_documents_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = TS.quality_scores(docs, "text", "doc_id")
    n = q.where(F.col("quality").isNotNull()).count()
    assert n == docs.count()


def test_pii_scan_detects_planted_pii(spark):
    from schema_guru_spark.operators.textstats import pii_scan
    df = spark.createDataFrame([
        (1, "contact me at alice@example.com or bob.smith+x@corp.co.uk"),
        (2, "call +1 (555) 123-4567 tomorrow"),
        (3, "ssn 123-45-6789 leaked"),
        (4, "server at 192.168.10.1 and 10.0.0.255"),
        (5, "clean document with no personal data"),
    ], "doc_id long, text string")
    rows = {r["id"]: r for r in pii_scan(df, "text", "doc_id").collect()}
    assert rows[1]["n_email"] == 2 and rows[1]["has_pii"]
    assert rows[2]["n_phone"] == 1
    assert rows[3]["n_ssn"] == 1
    assert rows[4]["n_ipv4"] == 2
    assert not rows[5]["has_pii"]
    assert all(rows[5][c] == 0 for c in
               ("n_email", "n_phone", "n_ssn", "n_ipv4"))


def test_repetition_signals_planted(spark):
    df = spark.createDataFrame([
        # "a b" appears 3x among 5 bigrams; 3-gram "a b a" twice
        (1, "a b a b a b"),
        # no repeats at all
        (2, "one two three four"),
        # too short for any bigram
        (3, "solo"),
        (4, ""),
    ], ["id", "text"])
    out = {r["id"]: r for r in
           TS.repetition_signals(df, "text", "id").collect()}
    assert out[1]["n_2grams"] == 5
    assert out[1]["top_2gram_n"] == 3           # "a b" x3
    assert out[1]["top_2gram_frac"] == 0.6
    assert out[1]["dup_2gram_frac"] == 0.6      # 5 grams, 2 distinct
    assert out[1]["dup_3gram_frac"] == 0.5      # 4 grams, 2 distinct
    assert out[2]["dup_2gram_frac"] == 0.0
    assert out[2]["top_2gram_n"] == 1
    assert out[3]["n_2grams"] == 0 and out[3]["top_2gram_n"] == 0
    assert out[3]["dup_2gram_frac"] == 0.0
    assert out[4]["n_2grams"] == 0 and out[4]["top_2gram_frac"] == 0.0


def test_repetition_signals_zero_shuffle(spark):
    """Every signal is a per-row expression: the plan must contain no
    exchange besides the orderBy's range partitioning."""
    df = spark.createDataFrame([(1, "a b a b")], ["id", "text"])
    plan = TS.repetition_signals(df, "text", "id") \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan and "Aggregate" not in plan


def test_contamination_check_planted(spark):
    docs = spark.createDataFrame([
        (10, "alpha beta gamma delta epsilon zeta"),   # contains bench gram
        (11, "totally different words here now folks"),
        (12, "alpha beta gamma delta epsilon eta theta"),
    ], ["id", "text"])
    bench = spark.createDataFrame(
        [(0, "prefix alpha beta gamma delta epsilon suffix")],
        ["id", "text"])
    out = {r["id"]: r for r in
           TS.contamination_check(docs, bench, "text", "id", n=5).collect()}
    assert out[10]["contaminated"] and out[10]["n_contaminated"] == 1
    assert out[12]["contaminated"]                 # shares the 5-gram
    assert not out[11]["contaminated"] and out[11]["n_contaminated"] == 0
    assert out[11]["contam_frac"] == 0.0
    # totals are distinct-gram counts
    assert out[10]["n_grams"] == 2


def test_contamination_broadcasts_benchmark(spark):
    docs = spark.createDataFrame([(1, "a b c d e f")], ["id", "text"])
    bench = spark.createDataFrame([(0, "a b c d e")], ["id", "text"])
    plan = TS.contamination_check(docs, bench, "text", "id", n=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_interdoc_span_census(spark):
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = spark.createDataFrame([
        (1, shared + " tail1"),
        (2, "head2 " + shared),
        (3, "nothing in common with anyone else at all"),
        # doc 4 contains the span twice: n_total counts occurrences
        (4, shared + " " + shared),
    ], ["id", "text"])
    rows = TS.interdoc_span_census(docs, "text", "id", k=8).collect()
    by_span = {r["span"]: r for r in rows}
    assert shared in by_span
    assert by_span[shared]["n_docs"] == 3
    assert by_span[shared]["n_total"] == 4
    # nothing from doc 3 leaks in
    assert all("nothing" not in s for s in by_span)


def test_curation_report_reason_codes(spark):
    docs = spark.createDataFrame([
        # clean keeper: long enough, stopwords, no repeats
        (1, "the cat and the dog are friends in a big house of wonder "
            "for it is a fine day on the hill and all is well here"),
        # repetition offender
        (2, "spam spam spam spam spam spam spam spam spam spam spam"),
        # PII offender (quality padded to pass the other checks)
        (3, "the report for john is at john.doe@example.com and it is "
            "a long enough document in the usual style of all of it"),
        # contaminated: contains the benchmark 13-gram verbatim
        (4, "the quick brown fox jumps over the lazy dog every single "
            "day and it is a fine sight for all of us to see"),
    ], ["id", "text"])
    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog every single "
             "day and nothing more")], ["id", "text"])
    out = {r["id"]: r for r in TS.curation_report(
        docs, "text", "id", bench=bench, contamination_n=13,
        allowed_langs=("en",)).collect()}
    assert out[1]["keep"] and out[1]["reasons"] == ""
    assert not out[2]["keep"]
    assert "high_top_2gram" in out[2]["reasons"]
    assert "high_dup_3gram" in out[2]["reasons"]
    assert not out[3]["keep"] and "pii" in out[3]["reasons"]
    assert out[3]["has_pii"]
    assert not out[4]["keep"] and out[4]["reasons"] == "contaminated"
    assert out[4]["contaminated"]
    # reasons are sorted + comma-joined
    assert out[2]["reasons"] == ",".join(sorted(out[2]["reasons"].split(",")))


def test_curation_report_without_bench_is_single_pass(spark):
    """No benchmark set => the verdict is one map-side pass: the plan
    must contain no joins and no aggregates."""
    df = spark.createDataFrame([(1, "the cat and the dog")], ["id", "text"])
    plan = TS.curation_report(df, "text", "id") \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan and "Aggregate" not in plan


def test_curation_report_broadcasts_benchmark(spark):
    docs = spark.createDataFrame([(1, "a b c d e f g h i j k l m")],
                                 ["id", "text"])
    bench = spark.createDataFrame([(0, "a b c d e f g h i j k l m")],
                                  ["id", "text"])
    plan = TS.curation_report(docs, "text", "id", bench=bench) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan


def test_source_mix_report(spark):
    docs = spark.createDataFrame([
        (1, "the cat and the dog are friends in a big house of wonder "
            "for it is a fine day on the hill and all is well here", "a"),
        (2, "the sun is up and the day is warm for all of us in town "
            "and the birds sing a song of it with joy and laughter", "a"),
        (3, "x", "b"),
    ], ["id", "text", "source"])
    out = {r["source"]: r for r in
           TS.source_mix_report(docs, "text", "source").collect()}
    assert out["a"]["n_docs"] == 2 and out["b"]["n_docs"] == 1
    assert out["a"]["doc_share"] == round(2 / 3, 6)
    assert out["b"]["doc_share"] == round(1 / 3, 6)
    assert out["a"]["mean_quality"] > out["b"]["mean_quality"]
    assert out["b"]["n_chars"] == 1 and out["b"]["n_tokens"] == 1


def test_source_mix_report_partition_invariant(spark, sf_dir):
    # round-3 verdict #2: avg(double) made mean_quality depend on the
    # partition merge order and finally landed on a rounding boundary.
    # The exact 1e-6-quantized aggregation must produce identical bytes
    # at any partitioning.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    runs = []
    for n_parts in (1, 7, 32):
        out = TS.source_mix_report(
            docs.repartition(n_parts), "text", "source").collect()
        runs.append([tuple(r) for r in out])
    assert runs[0] == runs[1] == runs[2]


def test_sorted_output_false_drops_the_exchange(spark):
    """ADVICE r04: the sorted-output contract costs a full-corpus range
    exchange (the narrow (id, text) sort). sorted_output=False must
    remove EVERY exchange from the per-row plans — at 100 TB the caller
    that doesn't need ordering shouldn't move the corpus over the
    network — while returning the same rows modulo order."""
    rows = [(i, f"doc {i} the and of to a in") for i in range(50)]
    df = spark.createDataFrame(rows, ["id", "text"])
    for op in (TS.token_stats, TS.quality_scores, TS.lang_id,
               TS.pii_scan, TS.repetition_signals, TS.fingerprints):
        unsorted = op(df, "text", "id", sorted_output=False)
        plan = unsorted._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, (op.__name__, plan)
        got = sorted(map(tuple, unsorted.collect()))
        want = sorted(map(tuple, op(df, "text", "id").collect()))
        assert got == want, op.__name__


def test_pii_phone_matches_domestic_formats(spark):
    """The country-code prefix must be OPTIONAL: '(555) 123-4567',
    '555-123-4567' and '555.123.4567' are the standard US forms — a
    mandatory [0-9]{1,3} prefix made them all false negatives, so
    PII-bearing documents were released unredacted."""
    df = spark.createDataFrame([
        (1, "call me at (555) 123-4567 today"),
        (2, "alt: 555-123-4567"),
        (3, "dots 555.123.4567 work too"),
        (4, "intl +1 555-123-4567 still matches"),
        (5, "version 1.2.3 and date 2024-01-02 are not phones"),
        (6, "digits 12345678901234 without separators are not"),
    ], "doc_id long, text string")
    rows = {r["id"]: r
            for r in TS.pii_scan(df, "text", "doc_id").collect()}
    for i in (1, 2, 3, 4):
        assert rows[i]["n_phone"] == 1 and rows[i]["has_pii"], i
    for i in (5, 6):
        assert rows[i]["n_phone"] == 0, i
