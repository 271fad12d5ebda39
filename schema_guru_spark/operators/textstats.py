"""Text analysis for corpus curation: language ID, quality scoring,
token counting, document fingerprinting.

Everything here is JVM-expression-only (split/regexp/array ops inside
whole-stage codegen) — no Python in the hot path — and each operator has
a DuckDB-expressible oracle twin in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language stopword inventories for the n-gram/stopword-hit
# heuristic (deterministic; extend per deployment)
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "dans", "pour"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "de", "en", "por"),
}

# BPE-ish tokenization: words, numbers, or single non-space symbols
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _words(col: Column) -> Column:
    return F.split(F.lower(F.trim(col)), r"\s+")


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens + chars.
    regexp_count keeps it codegen'd."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(_words(c)).alias("n_ws_tokens"),
        F.regexp_count(c, F.lit(BPE_ISH_RE)).alias("n_bpe_tokens"),
        F.length(c).alias("n_chars"),
    ).orderBy("id")


def quality_scores(df: DataFrame, text_col: str, id_col: str,
                   lang: str = "en") -> DataFrame:
    """Heuristic quality scoring: length, punctuation ratio, stopword
    ratio, mean word length, and a composite [0,1] score. The formula is
    fixed (documented here) so downstream filters are reproducible:

        score = 0.25*len_ok + 0.25*(1 - punct_ratio_capped)
              + 0.25*stop_ok + 0.25*word_len_ok
    """
    c = F.col(text_col)
    words = _words(c)
    n_words = F.size(words)
    n_chars = F.length(c)
    n_punct = F.regexp_count(c, F.lit(r"[^\w\s]"))
    stops = STOPWORDS[lang]
    n_stop = F.size(F.array_intersect(
        words, F.array(*[F.lit(w) for w in stops])))
    # ratios (guarded)
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_hits = F.round(n_stop / F.lit(len(stops)), 6)
    mean_word_len = F.round((n_chars - (n_words - 1)) /
                            F.greatest(n_words, F.lit(1)), 6)
    len_ok = F.when((n_chars >= 50) & (n_chars <= 100000), 1.0).otherwise(0.0)
    word_len_ok = F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0),
                         1.0).otherwise(0.0)
    stop_ok = F.when(n_stop >= 2, 1.0).otherwise(0.0)
    punct_capped = F.least(punct_ratio * 4, F.lit(1.0))
    score = F.round(0.25 * len_ok + 0.25 * (1 - punct_capped)
                    + 0.25 * stop_ok + 0.25 * word_len_ok, 6)
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        punct_ratio.alias("punct_ratio"),
        stop_hits.alias("stopword_hits"),
        mean_word_len.alias("mean_word_len"),
        score.alias("quality"),
    ).orderBy("id")


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-hit language ID: count DISTINCT stopword hits per
    language (array_intersect — codegen), argmax with deterministic
    alphabetical tiebreak; 'und' (undetermined) when no hits."""
    words = _words(F.col(text_col))
    hits = [
        F.size(F.array_intersect(
            words, F.array(*[F.lit(w) for w in sw]))).alias(f"h_{lang}")
        for lang, sw in sorted(STOPWORDS.items())
    ]
    langs = sorted(STOPWORDS)
    base = df.select(F.col(id_col).alias("id"), *hits)
    best = F.greatest(*[F.col(f"h_{la}") for la in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for la in langs:  # alphabetical order => deterministic tiebreak
        pred = pred.when(F.col(f"h_{la}") == best, F.lit(la))
    return base.select("id", *[f"h_{la}" for la in langs],
                       pred.alias("lang_pred")).orderBy("id")


def fingerprints(df: DataFrame, text_col: str, id_col: str,
                 ngram: int = 8, window: int = 4) -> DataFrame:
    """Document fingerprinting (winnowing — Schleimer et al., SIGMOD'03):
      content_md5 — digest of whitespace-normalized lowercase text
      winnow_min  — global minimum k-gram hash (1-hash sketch)
      winnow_fps  — the winnowing fingerprint set: minimum hash of every
                    sliding window of ``window`` consecutive k-gram
                    hashes, deduplicated and sorted (csv string for
                    cross-engine value comparison)

    The k-gram hash is an md5 prefix (``conv(substr(md5(g),1,15),16,10)``,
    60-bit) so the DuckDB oracle reproduces it exactly. All JVM array
    expressions — one pass, no shuffle, no Python.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    n_kgrams = F.greatest(F.length(norm) - (ngram - 1), F.lit(1))
    kgram_hashes = F.transform(
        F.sequence(F.lit(1), n_kgrams),
        lambda i: F.conv(
            F.substring(F.md5(F.substring(norm, i, ngram).cast("binary")),
                        1, 15), 16, 10).cast("bigint"),
    )
    kh = "_kgram_hashes"
    n_wins = F.greatest(F.size(F.col(kh)) - (window - 1), F.lit(1))
    window_mins = F.transform(
        F.sequence(F.lit(1), n_wins),
        lambda i: F.array_min(F.slice(F.col(kh), i, window)),
    )
    return (df.withColumn(kh, kgram_hashes)
            .select(
                F.col(id_col).alias("id"),
                F.md5(norm).alias("content_md5"),
                F.array_min(F.col(kh)).alias("winnow_min"),
                F.array_join(F.array_sort(F.array_distinct(window_mins)),
                             ",").alias("winnow_fps"),
            ).orderBy("id"))


# PII patterns — cross-engine (Spark regexp_count / DuckDB) regexes.
# Deliberately simple-and-auditable shapes; production deployments swap
# in their own pattern registry.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"
PII_SSN_RE = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"
PII_IPV4_RE = (r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
               r"(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}")


def pii_scan(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document PII indicator counts (emails, phone-shaped numbers,
    SSN-shaped ids, embedded ipv4) — the redaction-triage pass a
    training-data pipeline runs before release. Pure JVM regexp_count
    inside codegen; one pass, no shuffle; each count is an independent
    column so downstream policy (drop / redact / flag) filters push
    down to the scan."""
    c = F.col(text_col)
    out = df.select(
        F.col(id_col).alias("id"),
        F.regexp_count(c, F.lit(PII_EMAIL_RE)).alias("n_email"),
        F.regexp_count(c, F.lit(PII_PHONE_RE)).alias("n_phone"),
        F.regexp_count(c, F.lit(PII_SSN_RE)).alias("n_ssn"),
        F.regexp_count(c, F.lit(PII_IPV4_RE)).alias("n_ipv4"),
    )
    return out.withColumn(
        "has_pii",
        (F.col("n_email") + F.col("n_phone") + F.col("n_ssn")
         + F.col("n_ipv4")) > 0)
