"""Randomized JOINT-planting soak of the end-to-end validation job (NOT
collected by pytest — run: ``python tests/stress_fuzz_validation.py
[--rounds 6] [--seed 1]``).

The unit suite (tests/test_pipeline.py::test_planted_*) pins each
planted fixture ALONE on fixed sizes; this soak plants duplicate keys,
corrupted shas, a drifted repo, and dangling FK repos TOGETHER in one
table under random sizes / repo counts / bucketing, then asserts the
pipeline recovers every planted count exactly:

  V1 validate_repo_table: sum(n_sha_bad) == planted corrupt_shas and
     the 'sha256 mismatch' violation rows match it
  V2 row conservation: verdict n_rows sums to n_files
  V3 constraint_report: n_rows - n_exact_distinct == planted dup_keys;
     keys_unique iff dup_keys == 0; the HLL screen stays inside
     tolerance
  V4 referential integrity: dropping k repos from the dimension yields
     exactly those repos' row count as orphans
  V5 drift: the padded repo's buckets dominate worst_bucket_psi —
     report PSI strictly above the same table without padding
"""

from __future__ import annotations

import argparse
import json
import random
import sys

# runnable as `python tests/<this>.py` from anywhere
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import tempfile
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F
    from schema_guru_spark.pipeline import (constraint_report,
                                            validate_repo_table)
    from schema_guru_spark.sources.repo_table import write_repo_table

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .appName("stress_fuzz_validation").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    for rnd in range(args.rounds):
        rng = random.Random(args.seed + rnd)
        n_files = rng.randint(400, 4000)
        n_repos = rng.randint(3, 20)
        dup_keys = rng.choice([0, 1, rng.randint(2, 40)])
        corrupt = rng.choice([0, 1, rng.randint(2, 30)])
        n_buckets = rng.choice([4, 8, 16, 64])
        seed = rng.randint(0, 10**6)

        with tempfile.TemporaryDirectory() as td:
            base = f"{td}/repo_base"
            write_repo_table(spark, base, n_files, n_repos=n_repos,
                             seed=seed, dup_keys=dup_keys,
                             corrupt_shas=corrupt)
            df = spark.read.parquet(base)

            # V1 + V2
            res = validate_repo_table(spark, df, n_buckets=n_buckets,
                                      max_err_rate=1.0)
            agg = res.verdicts.agg(
                F.sum("n_sha_bad").alias("sha_bad"),
                F.sum("n_rows").alias("rows")).collect()[0]
            want_bad = min(corrupt, n_files - dup_keys)
            assert agg["sha_bad"] == want_bad, \
                (args.seed + rnd, "sha_bad", agg["sha_bad"], want_bad)
            assert agg["rows"] == n_files, (args.seed + rnd, agg["rows"])
            v = res.violations.where(
                F.col("detail") == "sha256 mismatch").count()
            assert v == want_bad, (args.seed + rnd, "sha rows", v, want_bad)

            # V3
            rep = constraint_report(spark, df, n_buckets=n_buckets)
            assert rep["n_rows"] == n_files
            assert rep["n_rows"] - rep["n_exact_distinct"] == dup_keys, \
                (args.seed + rnd, "dups", rep)
            assert rep["keys_unique"] == (dup_keys == 0)
            assert rep["hll_ok"], (args.seed + rnd, rep)
            assert rep["n_ri_orphans"] == 0

            # V4: drop k repos from the dimension
            all_repos = [r["repo"] for r in
                         df.select("repo").distinct().collect()]
            k = rng.randint(1, max(1, len(all_repos) // 3))
            missing = set(rng.sample(all_repos, k))
            dims = spark.createDataFrame(
                [(r,) for r in all_repos if r not in missing], ["repo"])
            rep2 = constraint_report(spark, df, n_buckets=n_buckets,
                                     repo_dims=dims)
            want_orph = df.where(F.col("repo").isin(list(missing))).count()
            assert rep2["n_ri_orphans"] == want_orph, \
                (args.seed + rnd, "orphans", rep2["n_ri_orphans"], want_orph)

            # V5: drift positive vs the same table without padding
            # (64 buckets x 8 salts concentrates a repo in ~8 buckets)
            target = df.groupBy("repo").count() \
                .orderBy(F.desc("count"), "repo").collect()
            target = target[min(1, len(target) - 1)]["repo"]
            drift_p = f"{td}/repo_drift"
            write_repo_table(spark, drift_p, n_files, n_repos=n_repos,
                             seed=seed, drift_repo=target)
            rep_d = constraint_report(
                spark, spark.read.parquet(drift_p), n_buckets=64)
            rep_b = constraint_report(spark, df, n_buckets=64)
            assert rep_d["worst_bucket_psi"] > rep_b["worst_bucket_psi"], \
                (args.seed + rnd, "drift", rep_d["worst_bucket_psi"],
                 rep_b["worst_bucket_psi"])

        print(f"round {rnd + 1}/{args.rounds} OK (files={n_files} "
              f"repos={n_repos} dups={dup_keys} corrupt={corrupt} "
              f"buckets={n_buckets})", flush=True)

    print(json.dumps({"fuzz": "validation_joint_planting",
                      "rounds": args.rounds, "seed": args.seed,
                      "sec": round(time.time() - t0, 1)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
