"""Similarity search over the embeddings table."""

import math

import pytest
from pyspark.sql import functions as F

from schema_guru_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def query_vec(emb):
    return emb.orderBy("vec_id").first()["embedding"]


def _cosine(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb + 1e-12)


def test_cosine_topk_matches_python(emb, query_vec):
    got = SIM.cosine_topk(emb, query_vec, "embedding", "vec_id", k=10).collect()
    rows = emb.collect()
    expected = sorted(
        ((r["vec_id"], round(_cosine(r["embedding"], query_vec), 6))
         for r in rows),
        key=lambda t: (-t[1], t[0]))[:10]
    assert [(r["id"], r["cosine"]) for r in got] == expected
    assert got[0]["cosine"] == pytest.approx(1.0)  # query vec is in the set


def test_ivf_topk_recall(emb, query_vec):
    exact = {r["id"] for r in
             SIM.cosine_topk(emb, query_vec, "embedding", "vec_id", 10).collect()}
    approx = {r["id"] for r in
              SIM.ivf_topk(emb, query_vec, "embedding", "vec_id", k=10,
                           n_centroids=8, n_probe=4).collect()}
    # probing half the space: decent recall required, top-1 must survive
    assert len(exact & approx) >= 5
    top1 = SIM.ivf_topk(emb, query_vec, "embedding", "vec_id", k=1,
                        n_centroids=8, n_probe=4).first()
    assert top1["cosine"] == pytest.approx(1.0)


def test_ivf_probing_scans_subset(emb, query_vec):
    assign, cents = SIM.ivf_assign(emb, "embedding", "vec_id", n_centroids=8)
    assert assign.count() == emb.count()
    sizes = assign.groupBy("centroid_id").count().collect()
    assert len(sizes) == 8


def test_pairwise_topk_join(emb):
    left = emb.limit(5)
    out = SIM.pairwise_topk_join(left, emb, "embedding", "vec_id", k=3)
    rows = out.collect()
    assert len(rows) == 15
    # self-match is the top hit for each left id
    for lid in {r["id_l"] for r in rows}:
        top = [r for r in rows if r["id_l"] == lid][0]
        assert top["id_r"] == lid and top["cosine"] == pytest.approx(1.0)


def test_ivf_bucketed_scan_prunes_partitions(spark, sf_dir, tmp_path):
    """The materialized IVF layout must turn probing into partition
    pruning: the probe scan's input files all live under the n_probe
    probed centroid directories, and the plan carries the partition
    filter."""
    from schema_guru_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf_table")
    SIM.write_ivf_bucketed(emb, path, "embedding", "vec_id", n_centroids=8)

    qvec = emb.where(F.col("vec_id") == 0).first()["embedding"]
    out = SIM.ivf_topk_bucketed(spark, path, qvec, k=5, n_probe=3)
    rows = out.collect()
    assert 0 < len(rows) <= 5

    # the SCAN's own metrics after execution: files/partitions actually
    # read (inputFiles() lists the whole FileIndex pre-pruning, so it is
    # NOT evidence — the executed FileSourceScan is)
    from conftest import scan_metrics

    import glob
    n_dirs_on_disk = len(glob.glob(path + "/centroid_id=*"))
    assert n_dirs_on_disk == 8
    m = scan_metrics(out)
    assert m.get("numPartitions") == 3, m   # only the probed buckets read
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan

    # probe-all over the layout == brute force over the raw table
    full = SIM.ivf_topk_bucketed(spark, path, qvec, k=5, n_probe=8).collect()
    brute = SIM.cosine_topk(emb, qvec, "embedding", "vec_id", k=5).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in brute]


def test_kmeans_ivf_training_improves_quantizer(spark, sf_dir):
    """Lloyd's rounds must not increase total quantization error, and
    the trained centroids must plug into assignment + bucketed layout."""
    from schema_guru_spark.operators import similarity as SIM

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def sse(centroids):
        assign = SIM.ivf_assign_to(emb, centroids, "embedding", "vec_id")
        vecs = emb.select(F.col("vec_id").alias("id"),
                          F.col("embedding").cast("array<double>").alias("v"))
        joined = vecs.join(assign, "id").join(centroids, "centroid_id")
        d2 = F.aggregate(
            F.zip_with("v", "cvec", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)
        return joined.agg(F.sum(d2)).collect()[0][0]

    _, init = SIM.ivf_assign(emb, "embedding", "vec_id", n_centroids=8)
    trained = SIM.ivf_train_kmeans(emb, "embedding", "vec_id",
                                   n_centroids=8, n_iters=3)
    e0, e1 = sse(init.localCheckpoint()), sse(trained)
    assert e1 <= e0 * 1.0001, (e0, e1)  # monotone non-increasing
    assert trained.count() == 8
    # dims survive the explode/reassemble roundtrip
    dim = len(emb.first()["embedding"])
    assert all(len(r["cvec"]) == dim for r in trained.collect())
    # assignment over trained centroids covers every vector exactly once
    assign = SIM.ivf_assign_to(emb, trained, "embedding", "vec_id")
    assert assign.count() == emb.count()
