"""Randomized soak of the corpus-selection operators (NOT collected by
pytest — run: ``python tests/stress_fuzz_sampling.py [--rounds 10]
[--seed 1]``).

Each round draws a random corpus (random strata incl. one hot-skewed
stratum, random token counts incl. zeros, random non-contiguous ids)
and random operator parameters, then checks the Spark operators against
exact Python brute force:

  S1 stratified_sample == per-row md5-threshold recomputation, AND
     the nested-samples law (raising every rate keeps a superset)
  S2 pack_sequences == driver-side cumulative packing, under a random
     n_ranges each round + token/doc conservation laws
  S3 topk_by_score == brute-force sort/head per stratum (ties by id),
     under random k and a random compact_every (forcing the
     accumulator-compaction path on some rounds)
  S4 hash_split == per-row cumulative-threshold recomputation (every
     row exactly one label), AND the nested-region law (growing the
     first label's fraction keeps a superset of its region)
  S5 domain_mix_plan == driver arithmetic (min(1, target*budget/n),
     floor for expected_kept) over brute per-stratum counts, AND
     apply_mix_plan == brute_sample under the plan's own rates

The unit suite (test_sampling.py) pins these on fixed seeds; this
script is the multi-seed adversarial-depth companion."""

from __future__ import annotations

import argparse
import hashlib
import random
import sys

# runnable as `python tests/<this>.py` from anywhere
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time


def gen_rows(rng: random.Random):
    strata = [f"s{j}" for j in range(rng.randint(1, 6))] + ["hot"]
    n = rng.randint(30, 300)
    ids = rng.sample(range(0, 10 * n), n)  # non-contiguous, unique
    rows = []
    for i in ids:
        s = "hot" if rng.random() < 0.4 else rng.choice(strata)
        rows.append((i, s, rng.choice([0, 1, rng.randint(1, 500)]),
                     round(rng.random(), 3)))
    return rows, strata


def brute_sample(rows, rates, default_rate, salt):
    kept = set()
    for (i, s, _n, _q) in rows:
        rate = rates.get(s, default_rate)
        if rate >= 1.0:
            kept.add(i)
            continue
        tok = hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8]
        thr = format(int(rate * (1 << 32)), "08x")
        if tok < thr:
            kept.add(i)
    return kept

def brute_pack(rows, budget):
    seqs = {}
    start = 0
    for i, n in sorted(rows):
        sid = start // budget
        agg = seqs.setdefault(sid, [0, 0, i, i])
        agg[0] += 1
        agg[1] += n
        agg[3] = i
        start += n
    return {sid: tuple(v) for sid, v in seqs.items()}


def brute_topk(rows, k):
    by = {}
    for (i, s, _n, q) in rows:
        by.setdefault(s, []).append((-q, i))
    out = {}
    for s, lst in by.items():
        for rank, (negq, i) in enumerate(sorted(lst)[:k], start=1):
            out[(s, rank)] = (i, -negq)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from schema_guru_spark.operators import sampling as SMP
    from schema_guru_spark.session import get_spark
    spark = get_spark("soak-sampling", master="local[4]",
                      shuffle_partitions=8)

    t0 = time.time()
    for rnd in range(args.rounds):
        rng = random.Random(args.seed * 10_007 + rnd)
        rows, strata = gen_rows(rng)
        nparts = rng.choice([1, 3, 8])
        df = (spark.createDataFrame(rows, ["id", "stratum", "n_tok", "score"])
              .repartition(nparts))

        # S1 stratified sampling + nested-samples law
        rates = {s: rng.choice([0.0, 0.1, 0.33, 0.5, 0.9, 1.0])
                 for s in rng.sample(strata, rng.randint(0, len(strata)))}
        dflt = rng.choice([0.0, 0.2, 0.5, 1.0])
        got = {r["id"] for r in
               SMP.stratified_sample(df, "stratum", "id", rates,
                                     dflt).collect()}
        want = brute_sample(rows, rates, dflt, SMP.DEFAULT_SALT)
        assert got == want, f"round {rnd}: S1 {got ^ want}"
        bumped = {s: min(1.0, r + 0.3) for s, r in rates.items()}
        up = {r["id"] for r in
              SMP.stratified_sample(df, "stratum", "id", bumped,
                                    min(1.0, dflt + 0.3)).collect()}
        assert got <= up, f"round {rnd}: nested-samples law"

        # S2 sequence packing
        budget = rng.choice([1, 7, 100, 999])
        n_ranges = rng.choice([1, 2, 5, 16])
        toks = [(i, n) for (i, _s, n, _q) in rows]
        out = SMP.pack_sequences(df, "id", "n_tok", budget=budget,
                                 n_ranges=n_ranges).collect()
        gotp = {r["seq_id"]: (r["n_docs"], r["n_tokens"],
                              r["first_doc"], r["last_doc"]) for r in out}
        assert gotp == brute_pack(toks, budget), f"round {rnd}: S2"
        assert sum(r["n_docs"] for r in out) == len(rows)
        assert sum(r["n_tokens"] for r in out) == sum(n for _i, n in toks)

        # S3 per-stratum top-k (narrow frame; random compaction)
        k = rng.choice([1, 3, 10, 10_000])
        compact = rng.choice([8, 64 * 1024])
        narrow = df.select("id", "stratum", F.col("score").alias("quality"))
        outk = SMP.topk_by_score(narrow, "stratum", "id", "quality", k,
                                 compact_every=compact).collect()
        gotk = {(r["stratum"], r["rank"]): (r["id"], r["quality"])
                for r in outk}
        assert gotk == brute_topk(rows, k), f"round {rnd}: S3"

        # S4 hash split: exactly-one-label + nested-region law
        n_splits = rng.randint(2, 4)
        ws = [rng.uniform(0.05, 1.0) for _ in range(n_splits)]
        fr = {f"p{j}": w / sum(ws) for j, w in enumerate(ws[:-1])}
        fr[f"p{n_splits - 1}"] = 1.0 - sum(fr.values())
        gots = {r["id"]: r["split"] for r in
                SMP.hash_split(df, "id", fr).collect()}
        wants = {}
        for (i, _s, _n, _q) in rows:
            tok = hashlib.md5(
                f"{SMP.DEFAULT_SALT}:{i}".encode()).hexdigest()[:8]
            cum, label = 0.0, list(fr)[-1]
            for lab in list(fr)[:-1]:
                cum += fr[lab]
                if tok < format(int(cum * (1 << 32)), "08x"):
                    label = lab
                    break
            wants[i] = label
        assert gots == wants, f"round {rnd}: S4"
        grow = dict(fr)
        first, last = list(fr)[0], list(fr)[-1]
        delta = min(0.2, grow[last] / 2)
        grow[first] += delta
        grow[last] -= delta
        a = {i for i, l in gots.items() if l == first}
        b = {r["id"] for r in SMP.hash_split(df, "id", grow)
             .where(f"split = '{first}'").collect()}
        assert a <= b, f"round {rnd}: S4 nested-region law"

        # S5 mixture plan + its application
        n_by = {}
        for (_i, s, _n, _q) in rows:
            n_by[s] = n_by.get(s, 0) + 1
        tgt_strata = rng.sample(strata, rng.randint(0, len(strata)))
        raw = {s: rng.uniform(0.01, 1.0) for s in tgt_strata}
        scale = rng.uniform(0.1, 1.0) / max(sum(raw.values()), 1e-9)
        targets = {s: w * scale for s, w in raw.items()}
        budget = rng.choice([1, 10, 200, 5000])
        plan = {r["stratum"]: r for r in
                SMP.domain_mix_plan(df, "stratum", targets,
                                    budget).collect()}
        assert set(plan) == set(n_by), f"round {rnd}: S5 strata"
        for s, r in plan.items():
            want_rate = min(1.0, (targets.get(s, 0.0) * budget) / n_by[s])
            assert r["rate"] == want_rate, f"round {rnd}: S5 rate {s}"
            assert r["expected_kept"] == int(want_rate * n_by[s] // 1)
            assert r["n_rows"] == n_by[s]
        applied = {r["id"] for r in
                   SMP.apply_mix_plan(df, "stratum", "id", targets,
                                      budget).collect()}
        want_applied = brute_sample(
            rows, {s: r["rate"] for s, r in plan.items() if r["rate"] > 0},
            0.0, SMP.DEFAULT_SALT)
        assert applied == want_applied, f"round {rnd}: S5 apply"

        print(f"round {rnd}: ok (n={len(rows)}, parts={nparts}, "
              f"budget={budget}, ranges={n_ranges}, k={k}, "
              f"splits={n_splits}, mix={len(targets)})", flush=True)

    print(f"ALL CLEAN: {args.rounds} rounds in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
