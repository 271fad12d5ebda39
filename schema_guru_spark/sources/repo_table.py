"""Deterministic synthetic source-code repository table.

Shape per BASELINE.json input_hint: (repo:string, path:string,
commit:string, lang:string, content:string) — plus ``content_sha``, the
reference sha256 carried with each row so the engine's per-row invariant
``sha2(content, 256) == content_sha`` is checkable end-to-end.

Fully distributed generation: every column is a deterministic Spark SQL
expression over ``spark.range(n)`` — no driver-side data, no RNG state,
so the same (n, seed) always produces byte-identical content at any
parallelism. Skew is built in: ~30% of all files land in repo 0 (the
"mega-repo"), exercising the salted-repartition path.

Content mix:
  lang == 'json'  (~40%): valid JSON metadata docs (nested object)
  lang == 'json' + corrupt flag (~1% of json): truncated JSON (parse error)
  other langs (py/java/go/md): source-code-ish text lines
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

LANGS = ("json", "py", "java", "go", "md")


def synthesize_repo_table(spark: SparkSession, n_files: int,
                          n_repos: int = 50, seed: int = 42,
                          dup_keys: int = 0) -> DataFrame:
    """``dup_keys`` > 0 plants that many duplicate (repo, path, commit)
    triples as ground truth for the uniqueness constraint (FIXTURES.md
    §1): the last ``dup_keys`` rows reuse the key columns of the first
    ``dup_keys`` rows (content stays their own), so
    n_rows - n_distinct_keys == dup_keys exactly."""
    key_id = (
        F.when(F.col("id") >= n_files - dup_keys,
               F.col("id") - (n_files - dup_keys))
        .otherwise(F.col("id"))
    ) if dup_keys else F.col("id")
    # every KEY column (repo/path/commit/lang) derives from _k so a
    # cloned key id reproduces the full key triple byte-identically;
    # content values keep deriving from the row's own id
    df = (spark.range(n_files)
          .withColumn("_k", key_id)
          .withColumn("_h", F.xxhash64("_k", F.lit(seed))))
    k = F.col("_k")
    # skew: ~30% of rows to repo 0
    repo_idx = (
        F.when(F.pmod("_h", F.lit(10)) < 3, F.lit(0))
        .otherwise(F.pmod(F.col("_h"), F.lit(n_repos)))
    )
    # weighted langs: json 4/10, py 2/10, java 2/10, go 1/10, md 1/10
    lang = (
        F.when(F.pmod(F.xxhash64("_k", F.lit(seed + 1)), F.lit(10)) < 4, F.lit("json"))
        .when(F.pmod(F.xxhash64("_k", F.lit(seed + 1)), F.lit(10)) < 6, F.lit("py"))
        .when(F.pmod(F.xxhash64("_k", F.lit(seed + 1)), F.lit(10)) < 8, F.lit("java"))
        .when(F.pmod(F.xxhash64("_k", F.lit(seed + 1)), F.lit(10)) < 9, F.lit("go"))
        .otherwise(F.lit("md"))
    )
    n = F.col("id")
    json_content = F.format_string(
        '{"name": "pkg-%d", "version": "1.%d.%d", "size": %d, '
        '"uuid": "%08x-0000-4000-8000-000000000000", '
        '"created": "2024-01-%02dT10:%02d:00Z", '
        '"homepage": "https://example.com/pkg/%d", '
        '"tags": ["t%d", "t%d"], '
        '"meta": {"stars": %d, "forks": %d, "archived": %s}}',
        n, F.pmod(n, F.lit(20)), F.pmod(n, F.lit(10)), F.pmod(n, F.lit(100000)),
        F.pmod(n, F.lit(0xFFFFFFF)) + 1,
        F.pmod(n, F.lit(28)) + 1, F.pmod(n, F.lit(60)),
        n,
        F.pmod(n, F.lit(7)), F.pmod(n, F.lit(5)),
        F.pmod(n, F.lit(9999)), F.pmod(n, F.lit(999)),
        F.when(F.pmod(n, F.lit(2)) == 0, F.lit("true")).otherwise(F.lit("false")),
    )
    # ~1% of json rows corrupt (truncated) -> parse-error violations
    corrupt = F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(100)) == 0
    code_content = F.format_string(
        "def fn_%d(x):\n    return x * %d  # module %d\n"
        "class C%d:\n    value = %d\n",
        n, F.pmod(n, F.lit(17)) + 1, F.pmod(n, F.lit(31)),
        F.pmod(n, F.lit(13)), F.pmod(n, F.lit(101)),
    )
    content = (
        F.when(lang == "json",
               F.when(corrupt, F.substring(json_content, 1, 40))
               .otherwise(json_content))
        .otherwise(code_content)
    )
    out = (
        df.select(
            F.format_string("org%d/repo%03d", F.pmod(repo_idx, F.lit(7)), repo_idx)
             .alias("repo"),
            F.format_string("src/%02d/file_%d.%s",
                            F.pmod(k, F.lit(50)), k, lang).alias("path"),
            F.sha2(F.concat(F.lit("commit"), k.cast("string"),
                            F.lit(seed).cast("string")), 256).substr(1, 40)
             .alias("commit"),
            lang.alias("lang"),
            content.alias("content"),
        )
        .withColumn("content_sha", F.sha2("content", 256))
    )
    return out


def write_repo_table(spark: SparkSession, path: str, n_files: int,
                     n_repos: int = 50, seed: int = 42,
                     corrupt_shas: int = 0, dup_keys: int = 0,
                     drift_repo: str = None) -> None:
    """Materialize to parquet, optionally planting constraint ground
    truth (FIXTURES.md §1):

      corrupt_shas  > 0: flip the recorded sha on that many
                    deterministic rows (invariant-violation fixtures)
      dup_keys      > 0: that many duplicate (repo,path,commit) triples
      drift_repo    pad this repo's content to ~5x length, shifting the
                    content-length distribution of the n_salts buckets
                    its rows land in (drift-detection positive); the sha
                    is recomputed so only the drift check fires
    """
    df = synthesize_repo_table(spark, n_files, n_repos, seed,
                               dup_keys=dup_keys)
    if drift_repo is not None:
        df = df.withColumn(
            "content",
            F.when(F.col("repo") == drift_repo,
                   F.concat(F.col("content"),
                            F.repeat(F.lit(" padding-for-drift"), 60)))
            .otherwise(F.col("content")),
        ).withColumn("content_sha", F.sha2("content", 256))
    if corrupt_shas:
        # EXACT count (like dup_keys), no shuffle: the synthesized path
        # embeds the deterministic row index ("file_{k}."), so a fixed
        # index range marks the planted rows. The range sits just BELOW
        # the dup_keys clone region (whose rows reuse low-k paths), so
        # the two fixtures never overlap and the planted count is
        # exactly min(corrupt_shas, n_files - dup_keys). The old
        # hash % (n_files // k) == 0 probe hit k rows only in
        # expectation and divided by zero for corrupt_shas > n_files
        # (r05 review).
        hi = max(0, n_files - dup_keys)
        lo = max(0, hi - corrupt_shas)
        k_col = F.regexp_extract("path", r"file_(\d+)\.", 1).cast("long")
        bad = (k_col >= F.lit(lo)) & (k_col < F.lit(hi))
        df = df.withColumn(
            "content_sha",
            F.when(bad, F.sha2(F.concat(F.col("content"), F.lit("x")), 256))
            .otherwise(F.col("content_sha")),
        )
    df.write.mode("overwrite").parquet(path)
