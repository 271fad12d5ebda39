"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — JVM-native (zip_with + aggregate
dot product inside codegen; no Python, no UDF). The scan is
embarrassingly parallel; top-k is a TakeOrdered (per-partition heap +
driver merge of k·P candidates), which is exactly how you want it at
100 TB.

Scale path: IVF (inverted-file) — deterministic coarse centroids, each
vector assigned to its nearest centroid ONCE (a write-time bucketing at
scale); a query probes only the ``n_probe`` nearest centroid buckets,
turning top-k into a partition-pruned scan of ~n_probe/C of the data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(df: DataFrame, query: Sequence[float], vec_col: str,
                id_col: str, k: int = 10) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query])
    v = F.col(vec_col).cast("array<double>")
    cos = _dot(v, q) / (_norm(v) * _norm(q) + F.lit(1e-12))
    return (df.select(F.col(id_col).alias("id"),
                      F.round(cos, 6).alias("cosine"))
              .orderBy(F.desc("cosine"), F.asc("id"))
              .limit(k))


def ivf_assign(df: DataFrame, vec_col: str, id_col: str,
               n_centroids: int = 16) -> tuple[DataFrame, DataFrame]:
    """Deterministic IVF coarse quantizer.

    Centroids: the vectors with the n_centroids smallest xxhash64(id) —
    a deterministic RNG-free pseudo-random sample selected with
    TakeOrdered (per-partition heaps + driver merge; no global sort or
    global window anywhere — the previous row_number-over-all-rows
    quantizer would have serialized on one task at scale). At real
    scale replace with a k-means pass; the bucketing contract is
    identical. Returns (assignments(id, centroid_id),
    centroids(centroid_id, cvec)). Assignment is one broadcast
    nested-loop of |df| x C array ops — all JVM; at write time this
    becomes the table's bucket column.
    """
    from pyspark.sql.window import Window
    vecs = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("v"))
    picked = (vecs.withColumn("_h", F.xxhash64("id"))
              .orderBy("_h").limit(n_centroids))  # TakeOrderedAndProject
    # numbering the C selected rows is a window over C rows only
    wc = Window.orderBy("_h")
    centroids = (picked.withColumn(
                     "centroid_id",
                     (F.row_number().over(wc) - 1).cast("int"))
                 .select("centroid_id", F.col("v").alias("cvec")))
    joined = vecs.crossJoin(F.broadcast(centroids))
    d2 = F.aggregate(F.zip_with("v", "cvec", lambda x, y: (x - y) * (x - y)),
                     F.lit(0.0), lambda acc, x: acc + x)
    scored = joined.select("id", "centroid_id", d2.alias("d2"))
    from pyspark.sql.window import Window as W2
    best = W2.partitionBy("id").orderBy(F.asc("d2"), F.asc("centroid_id"))
    assign = (scored.withColumn("rn", F.row_number().over(best))
              .where(F.col("rn") == 1).select("id", "centroid_id"))
    return assign, centroids


def ivf_topk(df: DataFrame, query: Sequence[float], vec_col: str,
             id_col: str, k: int = 10, n_centroids: int = 16,
             n_probe: int = 4,
             assignments: DataFrame | None = None,
             centroids: DataFrame | None = None) -> DataFrame:
    """IVF-probed cosine top-k: rank centroids by distance to the query
    (driver-side — C is tiny), scan only the n_probe best buckets.

    Pass precomputed (assignments, centroids) to amortize the quantizer
    across queries — the at-scale usage (bucketed table layout).
    """
    if assignments is None or centroids is None:
        assignments, centroids = ivf_assign(df, vec_col, id_col, n_centroids)
    q = [float(x) for x in query]
    cent_rows = centroids.collect()
    def d2(c):  # driver-side: C rows
        return sum((a - b) ** 2 for a, b in zip(c, q))
    probe = sorted(cent_rows, key=lambda r: (d2(r["cvec"]), r["centroid_id"]))
    probe_ids = [r["centroid_id"] for r in probe[:n_probe]]

    sub = (df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
           .join(assignments, "id")
           .where(F.col("centroid_id").isin(probe_ids)))
    qa = F.array(*[F.lit(x) for x in q])
    v = F.col("v").cast("array<double>")
    cos = _dot(v, qa) / (_norm(v) * _norm(qa) + F.lit(1e-12))
    return (sub.select("id", F.round(cos, 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("id"))
            .limit(k))


def ivf_train_kmeans(df: DataFrame, vec_col: str, id_col: str,
                     n_centroids: int = 16, n_iters: int = 5) -> DataFrame:
    """Distributed Lloyd's k-means refinement of the IVF coarse
    quantizer — entirely DataFrame ops, no Python in the loop:

      assign:  broadcast the C centroids, |df| x C distance expressions
               (JVM zip_with/aggregate), per-id argmin via window over C
               rows per id
      update:  posexplode to (centroid, dim, val) rows, one
               groupBy(centroid, dim) avg — a map-side-combined hash
               aggregate whose output is C x dim rows regardless of
               data size — then arrays reassembled from sorted
               (dim, mean) structs

    Empty clusters keep their previous centroid (left-join + coalesce).
    Deterministic: seeded by the xxhash64 sample of ``ivf_assign``; each
    round localCheckpoints the (tiny) centroid frame to truncate the
    iterative lineage. Returns centroids(centroid_id, cvec).
    """
    from pyspark.sql.window import Window

    vecs = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("v"))
    _, centroids = ivf_assign(df, vec_col, id_col, n_centroids)
    centroids = centroids.localCheckpoint()
    best = Window.partitionBy("id").orderBy(F.asc("d2"), F.asc("centroid_id"))
    d2 = F.aggregate(F.zip_with("v", "cvec", lambda x, y: (x - y) * (x - y)),
                     F.lit(0.0), lambda acc, x: acc + x)
    for _ in range(n_iters):
        assign = (vecs.crossJoin(F.broadcast(centroids))
                  .select("id", "v", "centroid_id", d2.alias("d2"))
                  .withColumn("rn", F.row_number().over(best))
                  .where(F.col("rn") == 1)
                  .select("id", "v", "centroid_id"))
        dim_means = (assign
                     .select("centroid_id",
                             F.posexplode("v").alias("dim", "val"))
                     .groupBy("centroid_id", "dim")
                     .agg(F.avg("val").alias("m")))
        new_cent = (dim_means
                    .groupBy("centroid_id")
                    .agg(F.transform(
                        F.array_sort(F.collect_list(F.struct("dim", "m"))),
                        lambda s: s["m"]).alias("cvec")))
        centroids = (centroids.select("centroid_id",
                                      F.col("cvec").alias("prev"))
                     .join(new_cent, "centroid_id", "left")
                     .select("centroid_id",
                             F.coalesce("cvec", "prev").alias("cvec"))
                     .localCheckpoint())
    return centroids


def ivf_assign_to(df: DataFrame, centroids: DataFrame, vec_col: str,
                  id_col: str) -> DataFrame:
    """Assign every vector to its nearest centroid from a TRAINED
    centroid set (one broadcast pass) — the write-time bucketing step
    when k-means centroids replace the pseudo-random sample."""
    from pyspark.sql.window import Window

    vecs = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).cast("array<double>").alias("v"))
    d2 = F.aggregate(F.zip_with("v", "cvec", lambda x, y: (x - y) * (x - y)),
                     F.lit(0.0), lambda acc, x: acc + x)
    best = Window.partitionBy("id").orderBy(F.asc("d2"), F.asc("centroid_id"))
    return (vecs.crossJoin(F.broadcast(centroids))
            .select("id", "centroid_id", d2.alias("d2"))
            .withColumn("rn", F.row_number().over(best))
            .where(F.col("rn") == 1).select("id", "centroid_id"))


def write_ivf_bucketed(df: DataFrame, path: str, vec_col: str,
                       id_col: str, n_centroids: int = 16,
                       centroids: DataFrame | None = None) -> None:
    """Materialize the IVF layout as a WRITE-TIME table: vectors stored
    under ``path`` partitioned by ``centroid_id`` (one directory per
    coarse bucket), centroids under ``path + "_centroids"``.

    This is the 100 TB contract: the quantizer runs ONCE at ingest, and
    every subsequent query's ``WHERE centroid_id IN (<probes>)`` becomes
    Hive-style partition pruning — the scan physically reads only
    n_probe/C of the files (asserted by
    tests/test_similarity.py::test_ivf_bucketed_scan_prunes_partitions).

    Pass trained ``centroids`` (e.g. from ``ivf_train_kmeans``) to
    bucket against them; default uses the deterministic sample quantizer.
    """
    if centroids is not None:
        assign = ivf_assign_to(df, centroids, vec_col, id_col)
    else:
        assign, centroids = ivf_assign(df, vec_col, id_col, n_centroids)
    data = (df.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("v"))
            .join(assign, "id"))
    data.write.mode("overwrite").partitionBy("centroid_id").parquet(path)
    centroids.write.mode("overwrite").parquet(path + "_centroids")


def ivf_topk_bucketed(spark, path: str, query: Sequence[float],
                      k: int = 10, n_probe: int = 4) -> DataFrame:
    """Cosine top-k over a table written by ``write_ivf_bucketed``:
    rank the (tiny, driver-side) centroid set against the query, then
    scan ONLY the n_probe best partitions — the isin filter prunes at
    the directory level, no quantizer work per query."""
    q = [float(x) for x in query]
    cent_rows = spark.read.parquet(path + "_centroids").collect()

    def d2(c):
        return sum((a - b) ** 2 for a, b in zip(c, q))

    probe = sorted(cent_rows, key=lambda r: (d2(r["cvec"]), r["centroid_id"]))
    probe_ids = [r["centroid_id"] for r in probe[:n_probe]]
    sub = spark.read.parquet(path).where(F.col("centroid_id").isin(probe_ids))
    qa = F.array(*[F.lit(x) for x in q])
    cos = _dot(F.col("v"), qa) / (_norm(F.col("v")) * _norm(qa) + F.lit(1e-12))
    return (sub.select("id", F.round(cos, 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("id"))
            .limit(k))


def pairwise_topk_join(left: DataFrame, right: DataFrame, vec_col: str,
                       id_col: str, k: int = 5) -> DataFrame:
    """k-NN join of two embedding sets: for each left id the top-k
    right ids by cosine; window top-k per left id.

    ``right`` is ALWAYS the broadcast side — pass the small set (the
    queries/probe set) as ``right`` and the large one as ``left``; a
    row-scale ``right`` will fail the broadcast, loudly, rather than
    silently plan a shuffle cross join. At 100 TB gate this behind IVF
    bucketing (join on centroid_id)."""
    from pyspark.sql.window import Window
    l = left.select(F.col(id_col).alias("id_l"),
                    F.col(vec_col).cast("array<double>").alias("vl"))
    r = right.select(F.col(id_col).alias("id_r"),
                     F.col(vec_col).cast("array<double>").alias("vr"))
    cos = _dot(F.col("vl"), F.col("vr")) / \
        (_norm(F.col("vl")) * _norm(F.col("vr")) + F.lit(1e-12))
    scored = l.crossJoin(F.broadcast(r)).select(
        "id_l", "id_r", F.round(cos, 6).alias("cosine"))
    w = Window.partitionBy("id_l").orderBy(F.desc("cosine"), F.asc("id_r"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k).drop("rn")
            .orderBy("id_l", F.desc("cosine"), "id_r"))
