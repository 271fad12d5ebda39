"""Randomized-corpus soak of the dedup/similarity operators (NOT
collected by pytest — run: ``python tests/stress_fuzz_dedup.py
[--rounds 10] [--seed 1]``).

Each round builds a random corpus (random token docs + planted exact
twins + near-twins by single-token edits + empty/whitespace/unicode
docs) and checks the Spark operators against exact Python brute force:

  D1 exact_duplicates == pandas groupby on the raw text
  D2 simhash_near_duplicates == brute-force hamming <= t over
     brute-force-recomputed 60-bit fingerprints (recall-1 banding law)
  D3 ngram_jaccard_pairs == brute-force 3-gram Jaccard >= threshold
  D4 minhash_verified_pairs: precision exact (every returned pair's
     true shingle Jaccard >= threshold) AND exact twins always found
  D5 near_duplicate_clusters == union-find over the same pair set
  D6 cosine_topk == numpy brute force (rounded scores, ties by id)

The unit suite (test_dedup.py / test_similarity.py) pins these on fixed
fixtures; this script is the adversarial-depth companion."""

from __future__ import annotations

import argparse
import hashlib
import itertools
import json
import random
import sys

# runnable as `python tests/<this>.py` from anywhere
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np


TOKENS = ["the", "and", "of", "to", "data", "spark", "schema", "guru",
          "alpha", "beta", "gamma", "delta", "x1", "y2", "z3", "é中",
          "loooooongtoken", "a", "b", "c", "d9", "q_w", "r-t"]


def gen_corpus(rng: random.Random):
    docs = []
    n = rng.randint(40, 90)
    for i in range(n):
        k = rng.randint(0, 30)
        docs.append(" ".join(rng.choice(TOKENS) for _ in range(k)))
    # planted exact twins
    for _ in range(rng.randint(2, 6)):
        docs.append(rng.choice(docs))
    # near-twins: flip/drop/add one token
    for _ in range(rng.randint(2, 6)):
        base = rng.choice([d for d in docs if d.strip()] or ["a b c"])
        toks = base.split()
        op = rng.random()
        if op < 0.34 and toks:
            toks[rng.randrange(len(toks))] = rng.choice(TOKENS)
        elif op < 0.67 and toks:
            del toks[rng.randrange(len(toks))]
        else:
            toks.insert(rng.randint(0, len(toks)), rng.choice(TOKENS))
        docs.append(" ".join(toks))
    docs.extend(["", "   ", "\t\n", rng.choice(TOKENS)])
    rng.shuffle(docs)
    return [(i, d) for i, d in enumerate(docs)]


SIMHASH_BITS = 60


def brute_simhash(text: str) -> int:
    sums = [0] * SIMHASH_BITS
    for tok in text.lower().strip().split():
        if not tok:
            continue
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        for j in range(SIMHASH_BITS):
            sums[j] += 1 if (h >> j) & 1 else -1
    fp = 0
    for j in range(SIMHASH_BITS):
        if sums[j] > 0:
            fp |= 1 << j
    return fp


def word_ngram_set(text: str, n: int = 3) -> frozenset:
    w = text.lower().strip().split()
    if len(w) < n:
        return frozenset()
    return frozenset(" ".join(w[i:i + n]) for i in range(len(w) - n + 1))


def jac(a: frozenset, b: frozenset) -> float:
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)


def union_find(n_ids, pairs):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min id per component
    return {i: find(i) for i in n_ids}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from schema_guru_spark.operators import dedup as D
    from schema_guru_spark.operators import similarity as S

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .appName("stress_fuzz_dedup").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    for rnd in range(args.rounds):
        rng = random.Random(args.seed + rnd)
        corpus = gen_corpus(rng)
        df = spark.createDataFrame(corpus, ["id", "text"]) \
                  .repartition(rng.choice([1, 3, 8]))

        # D1 exact duplicates: (digest, n, sorted ids)
        got = {(r["digest"], r["n"], tuple(r["ids"])) for r in
               D.exact_duplicates(df, "text", "id").collect()}
        by_text = {}
        for i, t in corpus:
            by_text.setdefault(t, []).append(i)
        want = {(hashlib.md5(t.encode()).hexdigest(), len(ids),
                 tuple(sorted(ids)))
                for t, ids in by_text.items() if len(ids) > 1}
        assert got == want, (args.seed + rnd, "exact", got ^ want)

        # D2 simhash: recall-1 banding vs brute force
        fps = {i: brute_simhash(t) for i, t in corpus}
        t_h = rng.choice([2, 3, 4])
        want_pairs = {
            (a, b, bin(fps[a] ^ fps[b]).count("1"))
            for a, b in itertools.combinations(sorted(fps), 2)
            if bin(fps[a] ^ fps[b]).count("1") <= t_h}
        got_pairs = {(r["id_a"], r["id_b"], r["hamming"]) for r in
                     D.simhash_near_duplicates(df, "id", "text",
                                               max_hamming=t_h).collect()}
        assert got_pairs == want_pairs, \
            (args.seed + rnd, "simhash", t_h, got_pairs ^ want_pairs)

        # D3 n-gram jaccard
        thr = rng.choice([0.3, 0.5, 0.8])
        grams = {i: word_ngram_set(t) for i, t in corpus}
        want_j = {(a, b): jac(grams[a], grams[b])
                  for a, b in itertools.combinations(sorted(grams), 2)
                  if grams[a] and jac(grams[a], grams[b]) >= thr}
        got_j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
                 D.ngram_jaccard_pairs(df, "id", "text", n=3,
                                       threshold=thr).collect()}
        assert set(got_j) == set(want_j), \
            (args.seed + rnd, "jaccard", thr, set(got_j) ^ set(want_j))
        for k in got_j:  # operator rounds to 6 for display
            assert abs(got_j[k] - want_j[k]) < 1e-6, (k, got_j[k], want_j[k])

        # D4 minhash verified pairs: exact precision + twin recall.
        # Verify basis = distinct char-5 shingles of the normalized text
        # (short docs contribute the whole text as one shingle)
        def char_shingles(text, k=5):
            t = " ".join(text.lower().split())
            if len(t) < k:
                return frozenset({t})
            return frozenset(t[i:i + k] for i in range(len(t) - k + 1))

        mh_thr = 0.7
        ver = D.minhash_verified_pairs(df, "id", "text",
                                       threshold=mh_thr).collect()
        sh = {i: char_shingles(t) for i, t in corpus}
        for r in ver:
            a, b = r["id_a"], r["id_b"]
            tj = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
            assert tj >= mh_thr - 1e-9, (args.seed + rnd, "mh precision",
                                         a, b, tj)
            assert abs(r["jaccard"] - tj) < 1e-6, (a, b, r["jaccard"], tj)
        got_mh = {frozenset((r["id_a"], r["id_b"])) for r in ver}
        texts = dict(corpus)
        for a, b in itertools.combinations(sorted(texts), 2):
            if texts[a] == texts[b]:
                assert frozenset((a, b)) in got_mh, \
                    (args.seed + rnd, "mh twin", a, b)

        # D5 clusters == union-find over the simhash pair set
        pair_df = spark.createDataFrame(
            [(a, b) for a, b, _ in want_pairs] or
            [(corpus[0][0], corpus[0][0])], ["id_a", "id_b"])
        comp = {r["id"]: r["cluster_id"] for r in
                D.near_duplicate_clusters(pair_df).collect()}
        ids = sorted({i for p in want_pairs for i in p[:2]} or {corpus[0][0]})
        want_comp = union_find(ids, [(a, b) for a, b, _ in want_pairs])
        assert comp == want_comp, (args.seed + rnd, "cc",
                                   {k: (comp.get(k), want_comp[k])
                                    for k in want_comp
                                    if comp.get(k) != want_comp[k]})

        # D6 cosine top-k vs numpy
        dim = rng.choice([4, 8])
        n_e = rng.randint(5, 40)
        vecs = [(i, [float(x) for x in
                     np.round(np.random.RandomState(args.seed + rnd + i)
                              .randn(dim), 4)]) for i in range(n_e)]
        emb = spark.createDataFrame(vecs, ["id", "vec"])
        q = [float(x) for x in
             np.round(np.random.RandomState(args.seed + rnd + 999)
                      .randn(dim), 4)]
        k = min(5, n_e)
        got_tk = [(r["id"], r["cosine"]) for r in
                  S.cosine_topk(emb, q, "vec", "id", k=k).collect()]
        m = np.array([v for _, v in vecs])
        qv = np.array(q)
        # the operator adds 1e-12 to the norm product and rounds to 6;
        # ordering is on the ROUNDED value, ties broken by id
        cos = np.round((m @ qv) /
                       (np.linalg.norm(m, axis=1) * np.linalg.norm(qv)
                        + 1e-12), 6)
        order = sorted(range(n_e), key=lambda i: (-cos[i], i))[:k]
        assert [i for i, _ in got_tk] == order, (args.seed + rnd, "topk",
                                                 got_tk, order)
        for (i, c) in got_tk:
            assert abs(c - cos[i]) < 5e-7, (i, c, cos[i])

        print(f"round {rnd + 1}/{args.rounds} OK "
              f"({len(corpus)} docs, t_h={t_h}, thr={thr})", flush=True)

    print(json.dumps({"fuzz": "dedup_similarity", "rounds": args.rounds,
                      "seed": args.seed,
                      "sec": round(time.time() - t0, 1)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
