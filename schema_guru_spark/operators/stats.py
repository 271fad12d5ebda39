"""Flat-column statistics — the Catalyst-native face of schema inference.

Each operator is the flat-column analog of a reference behavior
(SURVEY.md §2 mapping): string annotation (D2-D8) becomes native
length/regexp aggregates; integer encasing (T1) a CASE over min/max;
enum candidates (E1) a bounded distinct; Levenshtein key duplicates
(J1/J2) a cross join over DISTINCT keys with built-in ``levenshtein``.

Everything here is pure DataFrame API — whole-stage-codegen'd JVM
expressions, no Python in the hot path — so filters and projections push
down to the parquet/Iceberg scan and all aggregates get map-side partial
combine for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from schema_guru_spark.core.levenshtein import get_duplicates
from schema_guru_spark.core.transforms import (
    INT16_MAX, INT16_MIN, INT32_MAX, INT32_MIN, INT64_MAX, INT64_MIN,
)

# Cross-engine (Spark RLIKE / DuckDB regexp_matches) format regexes.
# Shape-only date-time check for engine parity; the kernel's detectors
# (core/formats.py) additionally validate the calendar.
UUID_SQL_RE = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
IPV4_SQL_RE = r"^(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}$"
URI_SQL_RE = r"^(https?|ftp)://[A-Za-z0-9.-]+\.[A-Za-z]{2,}(:[0-9]+)?(/[^ ]*)?$"
DATETIME_SQL_RE = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}[T ][0-9]{2}:[0-9]{2}:[0-9]{2}(\.[0-9]+)?(Z|[+-][0-9]{2}:?[0-9]{2})?$"


def string_profile(df: DataFrame, column: str) -> DataFrame:
    """Per-column string stats: the flat analog of StringSchema merge
    (A2, StringSchema.scala:47-57) + format detection counts (D3-D8).

    One hash-aggregate, partial+final phases by Catalyst.
    """
    c = F.col(column)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(c).alias("n_present"),
        F.min(F.length(c)).alias("min_len"),
        F.max(F.length(c)).alias("max_len"),
        F.count_distinct(c).alias("n_distinct"),
        F.sum(F.when(c.rlike(UUID_SQL_RE), 1).otherwise(0)).alias("n_uuid"),
        F.sum(F.when(c.rlike(IPV4_SQL_RE), 1).otherwise(0)).alias("n_ipv4"),
        F.sum(F.when(c.rlike(URI_SQL_RE), 1).otherwise(0)).alias("n_uri"),
        F.sum(F.when(c.rlike(DATETIME_SQL_RE), 1).otherwise(0)).alias("n_datetime"),
    )


def numeric_profile(df: DataFrame, column: str) -> DataFrame:
    """Numeric min/max/count + the Int16/32/64 encasing of the observed
    range (T1, Helpers.scala:151-201) as a CASE expression."""
    c = F.col(column)
    mn, mx = F.min(c), F.max(c)
    encased_min = (
        F.when((mn >= 0) & (mx <= INT16_MAX), F.lit(0))
        .when((mn >= INT16_MIN) & (mx <= INT16_MAX), F.lit(INT16_MIN))
        .when((mn >= 0) & (mx <= INT32_MAX), F.lit(0))
        .when((mn >= INT32_MIN) & (mx <= INT32_MAX), F.lit(INT32_MIN))
        .when(mn >= 0, F.lit(0))
        .otherwise(F.lit(INT64_MIN))
    )
    encased_max = (
        F.when((mn >= 0) & (mx <= INT16_MAX), F.lit(INT16_MAX))
        .when((mn >= INT16_MIN) & (mx <= INT16_MAX), F.lit(INT16_MAX))
        .when((mn >= 0) & (mx <= INT32_MAX), F.lit(INT32_MAX))
        .when((mn >= INT32_MIN) & (mx <= INT32_MAX), F.lit(INT32_MAX))
        .otherwise(F.lit(INT64_MAX))
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(c).alias("n_present"),
        mn.cast("double").alias("min_val"),
        mx.cast("double").alias("max_val"),
        encased_min.cast("bigint").alias("encased_min"),
        encased_max.cast("bigint").alias("encased_max"),
    )


def enum_candidates(df: DataFrame, column: str, cardinality: int) -> DataFrame:
    """Flat analog of E1 (SchemaWithEnum.scala:57-70): keep the value set
    iff its size is within cardinality, else tombstone (NULL).

    Bounded-state plan (a high-cardinality column — the common case when
    probing an id column for enum-ness — must not OOM an executor):

      1. ``distinct()`` — a spill-safe hash aggregate; no row set is ever
         materialized in one aggregation buffer.
      2. ``limit(cardinality + 1)`` on the distinct frame — at most K+1
         values ever leave the aggregate (CollectLimit early-out), so the
         ``collect_list`` that builds the enum array holds <= K+1 items
         regardless of the column's true cardinality.
      3. The exact ``n_distinct`` gate runs as its own count over the
         same distinct frame and tombstones the array past K.

    Sorted for determinism. (The previous single-aggregate plan ran
    ``collect_set`` over the full domain before gating — unbounded state.)
    """
    c = F.col(column)
    # NOT checkpointed, deliberately: materializing the distinct frame
    # would store the column's entire distinct domain in executor
    # blocks — O(distinct) storage, exactly the unbounded state this
    # function's design exists to avoid (a near-unique column at
    # 10^12 rows would spill TBs to save one re-scan). The two scans
    # (count + limit K+1) keep state bounded at K+1 values.
    d = df.select(c.alias("v")).where(c.isNotNull()).distinct()
    n = d.agg(F.count(F.lit(1)).alias("n_distinct"))
    capped = d.limit(cardinality + 1).agg(
        F.array_sort(F.collect_list("v")).alias("values"))
    return n.crossJoin(F.broadcast(capped)).select(
        "n_distinct",
        F.when(F.col("n_distinct") <= cardinality, F.col("values"))
         .otherwise(F.lit(None)).alias("enum"),
    )


def _distinct_keys(df: DataFrame, column: str) -> DataFrame:
    return (df.select(F.col(column).alias("k"))
            .where(F.col("k").isNotNull())
            .distinct()
            .where(F.length("k") > 3))


def duplicate_keys(df: DataFrame, column: str,
                   max_driver_keys: int = 2_000) -> DataFrame:
    """Levenshtein near-duplicate detection over the DISTINCT values of a
    column — J1+J2 (LevenshteinAnnotator.scala:39-114): uniform (strip -_
    and lowercase), edit distance <= 1 over keys longer than 3, canonical
    (min, max) pair order.

    Scale shape: the DISTINCT reduction is always distributed (partial
    hash-aggregate, one shuffle of the reduced key set). The pairing
    stage is guarded: up to ``max_driver_keys`` distinct values it runs
    on the driver exactly like the reference (LevenshteinAnnotator is a
    driver-side pass over merged-schema keys — schema-cardinality data).
    Past the cap — a caller pointing the operator at a row-scale column —
    it falls back to ``duplicate_keys_distributed``, so no input can OOM
    the driver. The cap bounds the driver's O(K²) pure-Python distance
    loop, not just memory (compare_sets streams pairs): 2,000 keys ≈
    4M comparisons ≈ seconds; schema-key inputs are orders of magnitude
    below it. The guard costs nothing extra: the same limit(K+1)
    collect that fetches the keys detects overflow.
    """
    limited = _distinct_keys(df, column).limit(max_driver_keys + 1).collect()
    if len(limited) > max_driver_keys:
        return duplicate_keys_distributed(df, column)
    pairs = sorted(get_duplicates({r.k for r in limited}))
    return df.sparkSession.createDataFrame(
        pairs, "key_a string, key_b string")


def duplicate_keys_distributed(df: DataFrame, column: str) -> DataFrame:
    """Fully distributed edit-distance-1 pairing via deletion-neighborhood
    blocking (the FastSS/SymSpell family): two uniformed strings within
    edit distance 1 must share a member of D1(x) = {x} ∪ {x minus one
    char} — equal strings share x, a substitution shares the both-deleted
    form, an insertion shares the shorter string. So candidates come from
    an equi-join on the exploded variant strings (shuffle key = variant;
    |D1| = len+1 per key, bounded by key length), then exact
    ``levenshtein <= 1`` verifies. No cross join, no driver state —
    cost is Σ|variant-bucket|², never |keys|².
    """
    keys = _distinct_keys(df, column)
    from schema_guru_spark.functions import uniform_string
    u = uniform_string(F.col("k"))
    deletions = F.transform(
        F.sequence(F.lit(1), F.length("u")),
        lambda i: F.concat(F.substring("u", F.lit(1), i - 1),
                           F.substring("u", i + 1, F.length("u"))),
    )
    variants = (
        keys.withColumn("u", u)
        .withColumn(
            "variant",
            F.explode(F.when(F.length("u") >= 1,
                             F.array_union(F.array(F.col("u")), deletions))
                      .otherwise(F.array(F.col("u")))))
        # both self-join sides read this; without the checkpoint each
        # side re-runs the base-table scan + distinct + explode.
        # eager=False keeps DataFrame construction side-effect-free —
        # the first action materializes it
        .localCheckpoint(eager=False)
    )
    l, r = variants.alias("l"), variants.alias("r")
    return (
        l.join(r, "variant")
        .where(F.col("l.k") < F.col("r.k"))
        .select(F.col("l.k").alias("key_a"), F.col("r.k").alias("key_b"),
                F.col("l.u").alias("u_a"), F.col("r.u").alias("u_b"))
        .distinct()
        .where(F.levenshtein("u_a", "u_b") <= 1)
        .select("key_a", "key_b")
    )


def group_with_latest(df: DataFrame, group_cols: list, order_cols: list) -> DataFrame:
    """G3 (DdlCommand.scala:374-389): per group keep the row with the max
    ordering tuple — window row_number, no self-join."""
    w = Window.partitionBy(*group_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (df.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") == 1)
              .drop("_rn"))


def keys_diff(current: DataFrame, previous: DataFrame, col: str) -> DataFrame:
    """SET1/SET2 (Migrations.scala:106,117-122): keys present in
    ``current`` but not ``previous``."""
    return (current.select(F.col(col).alias("key")).distinct()
            .exceptAll(previous.select(F.col(col).alias("key")).distinct()))


def segment_counts(df: DataFrame, json_col: str, json_path: str) -> DataFrame:
    """G1 (JsonPathExtractorRDD.scala:53-88): JSONPath extract + key
    normalization (slice 30 chars, [^a-zA-Z0-9.-] -> _, null/empty ->
    'unmatched') + group counts. Pure built-ins: get_json_object +
    regexp_replace + substring."""
    from schema_guru_spark.functions import normalize_segment_key
    raw = F.get_json_object(F.col(json_col), json_path)
    key = normalize_segment_key(raw)
    return (df.withColumn("segment", key)
              .groupBy("segment").agg(F.count(F.lit(1)).alias("n"))
              .orderBy("segment"))


def snakify(col):
    """F4 — re-exported from functions (the single parity copy)."""
    from schema_guru_spark.functions import snakify as _snakify
    return _snakify(col)
