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
