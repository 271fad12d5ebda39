"""Measure the incremental re-validation claim: after an append, the
cost of re-validation tracks the DELTA size, not the table size.

Protocol (steady-state, one Spark session, idle host — same rules as
bench_scaling.py):

  1. build an Iceberg v2 table of N base rows (repo-table shape from
     the deterministic synthesizer, chunked appends with distinct
     seeds so keys never collide across chunks);
  2. validate the base snapshot through the incremental API (this
     also warms the Python worker pool + codegen, so both timed legs
     below are steady-state);
  3. commit one more append of N * delta_frac rows;
  4. timed leg A — FULL validation from a fresh checkpoint (what a
     non-incremental engine must redo after any append);
  5. timed leg B — INCREMENTAL validation against the base
     checkpoint: plans only the appended files, then merges the
     cumulative view from checkpoint metadata;
  6. report wall seconds, speedup, and the data-file counts each
     plan touched (the metadata-level proof of the claim).

Prints one JSON line; --md appends it to BENCH/INCREMENTAL.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SCHEMA = [("repo", "string"), ("path", "string"), ("commit", "string"),
          ("lang", "string"), ("content", "string"),
          ("content_sha", "string")]
COLS = [c for c, _ in SCHEMA]


def _rows(spark, n, seed):
    from schema_guru_spark.sources.repo_table import synthesize_repo_table
    df = synthesize_repo_table(spark, n, seed=seed)
    return [{c: r[c] for c in COLS} for r in df.select(*COLS).collect()]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=1_000_000)
    ap.add_argument("--delta-frac", type=float, default=0.01)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--md", action="store_true")
    args = ap.parse_args(argv)

    from schema_guru_spark.plans.incremental import incremental_validate
    from schema_guru_spark.session import get_spark
    from schema_guru_spark.sources.iceberg_meta import (plan_incremental,
                                                        plan_scan)
    from schema_guru_spark.sources.iceberg_meta import append_snapshot

    spark = get_spark("sgs-bench-incr", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="sgs_incr_")
    tp = os.path.join(work, "repos")
    n_delta = int(args.base * args.delta_frac)
    kw = dict(n_buckets=args.buckets, max_err_rate=0.02)

    # 1. base table, chunked appends (distinct seeds -> distinct keys)
    chunk, done, i, s_base = 250_000, 0, 0, None
    while done < args.base:
        take = min(chunk, args.base - done)
        s_base = append_snapshot(tp, _rows(spark, take, seed=42 + i),
                                 SCHEMA, partition_by="lang")
        done += take
        i += 1

    # 2. base validation = the incremental checkpoint's history
    #    (doubles as the warm-up pass for steady-state timing)
    incr_ck = os.path.join(work, "ck_incr")
    t0 = time.perf_counter()
    rep_base = incremental_validate(spark, tp, incr_ck, **kw)
    t_base = time.perf_counter() - t0
    assert rep_base["mode"] == "baseline"
    spark.catalog.clearCache()

    # 3. the append under test
    append_snapshot(tp, _rows(spark, n_delta, seed=999), SCHEMA,
                    partition_by="lang")

    # 4. timed: full re-validation from scratch
    t0 = time.perf_counter()
    rep_full = incremental_validate(spark, tp,
                                    os.path.join(work, "ck_full"), **kw)
    t_full = time.perf_counter() - t0
    assert rep_full["mode"] == "baseline"
    assert rep_full["cumulative"]["rows"] == args.base + n_delta
    spark.catalog.clearCache()

    # 5. timed: incremental re-validation
    t0 = time.perf_counter()
    rep_incr = incremental_validate(spark, tp, incr_ck, **kw)
    t_incr = time.perf_counter() - t0
    assert rep_incr["mode"] == "incremental", rep_incr["mode"]
    assert rep_incr["delta"]["rows"] == n_delta
    assert rep_incr["cumulative"]["rows"] == args.base + n_delta
    assert rep_incr["cumulative"]["pass_rate"] == \
        rep_full["cumulative"]["pass_rate"]

    cur = rep_incr["to_snapshot"]
    out = {
        "metric": "incremental_revalidation",
        "base_rows": args.base, "delta_rows": n_delta,
        "base_sec": round(t_base, 3),
        "full_sec": round(t_full, 3), "incr_sec": round(t_incr, 3),
        "speedup": round(t_full / max(t_incr, 1e-9), 1),
        "files_full_plan": len(plan_scan(tp, cur).data),
        "files_incr_plan": len(plan_incremental(tp, s_base, cur).data),
        "cumulative_rows": rep_incr["cumulative"]["rows"],
        "cumulative_pass_rate": rep_incr["cumulative"]["pass_rate"],
        "uniq_ok": rep_incr["cumulative"]["uniqueness"]["uniq_ok"],
        "cpus": args.cpus,
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(out))
    if args.md:
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/INCREMENTAL.md", "a") as fh:
            fh.write(json.dumps(out) + "\n")
    shutil.rmtree(work, ignore_errors=True)
    return out


if __name__ == "__main__":
    main()
