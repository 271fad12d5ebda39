"""Streaming deduplication for continuously-ingested corpora.

The batch dedup family (operators/dedup.py) assumes a complete table;
an ingest pipeline sees an unbounded stream. Two shapes, both pure
Structured Streaming built-ins — the state store, watermark eviction,
and exactly-once sink semantics come for free:

  * ``streaming_exact_dedup`` — drop rows whose content digest was
    already seen. ``dropDuplicatesWithinWatermark`` keys the state
    store on the digest and EVICTS entries older than the watermark —
    bounded state on an unbounded stream (a plain ``dropDuplicates``
    would grow state forever; at 100 TB/day that is an OOM, so the
    watermarked variant is the only admissible plan).
  * ``streaming_minhash_buckets`` — per-arrival LSH band buckets
    (same banding as the batch path), so near-dup candidate pairing
    against the historical index becomes a stream-static join on
    (band, band_hash) downstream.

Reference: batch-only (SURVEY.md §2 'Streaming'); these are
brief-mandated training-data-pipeline extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_exact_dedup(stream: DataFrame, content_col: str,
                          ts_col: str, watermark: str = "10 minutes",
                          digest: str = "md5") -> DataFrame:
    """First-writer-wins exact dedup on a content digest.

    State: one digest per distinct content inside the watermark horizon;
    late duplicates beyond the horizon are the documented trade-off
    (bounded state vs infinite memory). The digest column stays on the
    output for downstream keyed sinks.
    """
    dig = (F.md5(F.col(content_col)) if digest == "md5"
           else F.sha2(F.col(content_col), 256))
    return (stream
            .withColumn("digest", dig)
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["digest"]))


def streaming_minhash_buckets(stream: DataFrame, id_col: str,
                              text_col: str, n_hashes: int = 64,
                              bands: int = 16,
                              shingle_k: int = 5) -> DataFrame:
    """(id, band, band_hash) bucket rows per arriving doc — identical
    hashing to the batch ``minhash_signatures``/banding, so stream
    buckets join against a batch-built index without re-hashing."""
    from schema_guru_spark.operators.dedup import (
        band_explode, minhash_signatures)

    assert n_hashes % bands == 0
    sigs = minhash_signatures(stream, id_col, text_col, n_hashes,
                              shingle_k)
    return sigs.select(
        "id", band_explode(bands, n_hashes // bands)
                .alias("band", "band_hash"))


def streaming_window_moments(stream: DataFrame, value_col: str,
                             ts_col: str, window: str = "1 minute",
                             watermark: str = "2 minutes") -> DataFrame:
    """Streaming drift monitor from the moment sketch: per event-time
    window accumulate the exact integer power sums (n, S1..S4) — the
    state per window is FIVE numbers, mergeable across micro-batches by
    construction, evicted by the watermark — and emit the standardized
    moments. Downstream alerting compares consecutive windows' moments
    (the batch twin `moment_drift_by_partition` does the same against a
    global reference). Output per window: (win_start, win_end, n, mean,
    variance, skewness, kurtosis_ex)."""
    from schema_guru_spark.operators.constraints import (
        moment_columns, power_sum_aggs)

    agg = (stream
           # null filter BEFORE the aggregate — identical to the batch
           # twin; without it n counts rows the sums skip and every
           # moment is corrupted
           .where(F.col(value_col).isNotNull())
           .withWatermark(ts_col, watermark)
           .groupBy(F.window(ts_col, window).alias("w"))
           .agg(*power_sum_aggs(value_col)))
    mean, var, skew, kurt = moment_columns(
        F.col("n"), F.col("s1"), F.col("s2"), F.col("s3"), F.col("s4"))
    return agg.select(
        F.col("w.start").alias("win_start"),
        F.col("w.end").alias("win_end"),
        "n",
        F.round(mean, 6).alias("mean"),
        F.round(var, 6).alias("variance"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("kurtosis_ex"),
    )
