"""Dedup operators on the documents table + synthetic near-dup fixtures."""

import pytest
from pyspark.sql import functions as F

from schema_guru_spark.operators import dedup as D


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def neardup_df(spark):
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest tonight")
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base.replace("tonight", "today")),       # near dup
        (4, "completely different text about spark dataframes and "
            "distributed aggregation pipelines at scale"),
        (5, base.replace("quick", "slow").replace("lazy", "busy")),  # near
        (6, "short"),
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def test_exact_duplicates(spark, neardup_df):
    out = D.exact_duplicates(neardup_df, "text", "id").collect()
    assert len(out) == 1
    assert out[0]["ids"] == [1, 2]


def test_exact_duplicates_none_in_documents(docs):
    assert D.exact_duplicates(docs, "text", "doc_id").count() == 0


def test_minhash_signatures_deterministic(neardup_df):
    s1 = {r["id"]: r["sig"] for r in
          D.minhash_signatures(neardup_df, "id", "text").collect()}
    s2 = {r["id"]: r["sig"] for r in
          D.minhash_signatures(neardup_df.repartition(3), "id", "text").collect()}
    assert s1 == s2
    assert len(s1[1]) == 64
    assert s1[1] == s1[2]  # identical docs -> identical signature


def test_minhash_lsh_finds_near_dups(neardup_df):
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in D.minhash_lsh_pairs(neardup_df, "id", "text",
                                          min_est_jaccard=0.4).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs or (2, 3) in pairs  # one-word change
    assert not any(4 in p for p in pairs)      # unrelated text excluded


def test_simhash_near_duplicates(neardup_df):
    out = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in D.simhash_near_duplicates(neardup_df, "id", "text",
                                              max_hamming=6).collect()}
    assert out[(1, 2)] == 0
    assert (1, 3) in out
    assert not any(4 in p for p in out)


def test_ngram_jaccard_exact(spark, neardup_df):
    out = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in D.ngram_jaccard_pairs(neardup_df, "id", "text",
                                          n=3, threshold=0.3).collect()}
    assert out[(1, 2)] == 1.0
    assert (1, 3) in out and 0.3 <= out[(1, 3)] < 1.0
    # verify one jaccard value against pure python
    rows = {r["id"]: r["text"] for r in neardup_df.collect()}

    def grams(t, n=3):
        w = t.lower().split()
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    g1, g3 = grams(rows[1]), grams(rows[3])
    expected = round(len(g1 & g3) / len(g1 | g3), 6)
    assert abs(out[(1, 3)] - expected) < 1e-9


def test_embedding_near_duplicates(spark):
    import numpy as np
    rng = np.random.RandomState(7)
    v1 = rng.standard_normal(16)
    v2 = v1 + rng.standard_normal(16) * 0.01   # near dup
    v3 = rng.standard_normal(16)               # unrelated
    df = spark.createDataFrame(
        [(1, v1.tolist()), (2, v2.tolist()), (3, v3.tolist())],
        "id bigint, vec array<double>")
    out = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in D.embedding_near_duplicates(df, "id", "vec",
                                                threshold=0.98).collect()}
    assert (1, 2) in out and out[(1, 2)] > 0.99
    assert not any(3 in p for p in out)


def test_minhash_lsh_on_documents(docs):
    # bag-of-common-words docs: LSH must run clean end-to-end
    pairs = D.minhash_lsh_pairs(docs.limit(200), "doc_id", "text",
                                min_est_jaccard=0.9)
    assert pairs.count() >= 0  # executes; near-identical bags may collide


def test_near_duplicate_clusters(spark):
    from schema_guru_spark.operators.dedup import near_duplicate_clusters
    # two components: a chain {1-2, 2-3, 3-4} and a pair {10-11};
    # singletons (no edges) are not emitted — they are their own cluster
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (10, 11)], "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"]
           for r in near_duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_clusters_from_minhash_pairs(spark):
    """End-to-end: duplicated docs -> minhash LSH pairs -> one cluster
    per duplicate group."""
    from schema_guru_spark.operators.dedup import (
        minhash_lsh_pairs, near_duplicate_clusters)
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    alt = base.replace("green", "dark")
    other = ("completely different content about spark dataframes "
             "and distributed aggregation semantics at scale")
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, alt), (4, other)],
        "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, "doc_id", "text")
    labels = {r["id"]: r["cluster_id"]
              for r in near_duplicate_clusters(pairs).collect()}
    # the three near-identical docs collapse into one cluster rooted at 1
    assert labels[1] == labels[2] == 1
    assert 4 not in labels  # no near-dup edges -> not in any cluster


def test_embedding_banded_lsh_recall(spark):
    """Pairs at cosine ~0.95 must mostly be FOUND: a single 16-plane
    bucket only catches ~18% of them (0.9^16); 4x4 banding ~99%."""
    import numpy as np
    rng = np.random.RandomState(7)
    rows = []
    for i in range(20):
        base = rng.standard_normal(32)
        base /= np.linalg.norm(base)
        # perturb to cosine ~0.95
        noise = rng.standard_normal(32)
        noise -= noise.dot(base) * base
        noise /= np.linalg.norm(noise)
        near = 0.95 * base + np.sqrt(1 - 0.95 ** 2) * noise
        rows.append((2 * i, base.tolist()))
        rows.append((2 * i + 1, near.tolist()))
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    got = {(r["id_a"], r["id_b"])
           for r in D.embedding_near_duplicates(
               df, "id", "vec", threshold=0.94).collect()}
    planted = {(2 * i, 2 * i + 1) for i in range(20)}
    found = len(planted & got)
    assert found >= 15, f"recall too low: {found}/20"


def test_minhash_verified_pairs_exact_jaccard(spark, neardup_df):
    out = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in D.minhash_verified_pairs(neardup_df, "id", "text",
                                             threshold=0.5).collect()}
    assert out[(1, 2)] == 1.0        # exact dup -> exact jaccard 1
    assert (1, 3) in out and 0.5 <= out[(1, 3)] < 1.0
    assert not any(4 in p for p in out)
    # the jaccard is the EXACT char-5-gram value, not the estimate
    rows = {r["id"]: r["text"] for r in neardup_df.collect()}

    def shingles(t, k=5):
        t = " ".join(t.lower().split())
        return {t[i:i + k] for i in range(max(len(t) - k + 1, 1))}

    g1, g3 = shingles(rows[1]), shingles(rows[3])
    assert out[(1, 3)] == round(len(g1 & g3) / len(g1 | g3), 6)


def test_simhash_fingerprint_range_and_determinism(neardup_df):
    fps = {r["id"]: r["fp"]
           for r in D.simhash_fingerprints(neardup_df, "id", "text").collect()}
    assert all(0 <= v < (1 << 60) for v in fps.values())
    assert fps[1] == fps[2]          # identical docs
    fps2 = {r["id"]: r["fp"] for r in D.simhash_fingerprints(
        neardup_df.repartition(3), "id", "text").collect()}
    assert fps == fps2


def test_embedding_zero_vectors_not_near_duplicates(spark):
    """Zero vectors collide in every LSH band (all sign bits 0); the
    cosine verify must exclude them (0/0 would be NaN, which Spark
    orders ABOVE all doubles — NaN >= threshold silently passed)."""
    import numpy as np
    rng = np.random.RandomState(11)
    v1 = rng.standard_normal(16)
    df = spark.createDataFrame(
        [(1, [0.0] * 16), (2, [0.0] * 16), (3, v1.tolist()),
         (4, (v1 + rng.standard_normal(16) * 0.01).tolist())],
        "id bigint, vec array<double>")
    out = {(r["id_a"], r["id_b"])
           for r in D.embedding_near_duplicates(df, "id", "vec",
                                                threshold=0.98).collect()}
    assert (1, 2) not in out          # zero-vector pair excluded
    assert out == {(3, 4)}            # the real twin still found
