"""Exact-KS plan comparison: r02 distributed range-bucketed prefix-sum
vs the r01 serial global-window CDF (VERDICT r02 'Next round' #3).

The r02 verdict accepted a 1.5-1.9x regression on ks_quantity_linestatus
(50 distinct values at sf0.1) as the cost of killing the serial
`WindowExec: No Partition Defined` stage. This bench demonstrates the
other side of that trade: as the pooled distinct-value count grows (the
continuous-column case the distributed plan exists for), the serial
window's single ordered task becomes the bottleneck and the distributed
plan overtakes.

Usage:  python BENCH/bench_ks_compare.py          # prints only
        python BENCH/bench_ks_compare.py --write  # BENCH/ks_compare_last_run.md
(REGRESSION_r03.md is CURATED — seeded from a --write run, then extended
with analysis and the headline-query table; --write deliberately targets
a separate file so re-runs can't clobber it.)

The serial implementation below is a verbatim test-only copy of the
pre-c136e42 ks_two_sample (git show c136e42~1) — kept HERE, not in the
package, so no production path can reach it.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def ks_serial(df: DataFrame, value_col: str, group_col: str,
              g1, g2) -> DataFrame:
    """r01 plan (test-only copy): global-window CDF — one task scans the
    whole distinct-value frame in order."""
    c = F.col(value_col)
    sub = (df.where(F.col(group_col).isin([g1, g2]) & c.isNotNull())
             .select(c.alias("v"), F.col(group_col).alias("g")))
    per_value = sub.groupBy("v").agg(
        F.sum(F.when(F.col("g") == g1, 1).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("g") == g2, 1).otherwise(0)).alias("d2"),
    )
    counts = per_value.agg(F.sum("d1").alias("n1"), F.sum("d2").alias("n2"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
                                       Window.currentRow)
    cdfs = (
        per_value
        .withColumn("c1", F.sum("d1").over(w))
        .withColumn("c2", F.sum("d2").over(w))
        .crossJoin(F.broadcast(counts))
        .select((F.abs(F.col("c1") / F.col("n1") - F.col("c2") / F.col("n2")))
                .alias("gap"))
    )
    return cdfs.agg(F.round(F.max("gap"), 6).alias("ks_stat"))


def synth_continuous(spark, n: int) -> DataFrame:
    """n rows, effectively all-distinct uniform doubles, two groups with
    a small planted location shift (so ks_stat is nonzero and stable)."""
    return spark.range(n).select(
        ((F.xxhash64("id").cast("double") / F.lit(float(1 << 63)) + 1) / 2
         + F.when(F.pmod("id", 2) == 0, F.lit(0.01)).otherwise(F.lit(0.0))
         ).alias("v"),
        F.when(F.pmod("id", 2) == 0, F.lit("a")).otherwise(F.lit("b"))
        .alias("g"),
    )


def timed(fn, repeats: int = 3) -> tuple[float, float]:
    """(best_warm_sec, value): run repeats times, return the best of the
    non-first runs (steady state) and the collected statistic."""
    val = None
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        val = fn().collect()[0]["ks_stat"]
        times.append(time.perf_counter() - t0)
    warm = min(times[1:]) if len(times) > 1 else times[0]
    return warm, val


def _scaling_leg(cpus: int, n: int) -> dict:
    """Run the synthetic case at one parallelism level in THIS process
    and print one JSON line — invoked as a subprocess per leg so each
    gets a fresh JVM (same methodology as bench_scaling.py)."""
    import json

    from schema_guru_spark.operators import constraints as C
    from schema_guru_spark.session import get_spark
    spark = get_spark(f"ks-leg-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    df = synth_continuous(spark, n).localCheckpoint()
    t_ser, v1 = timed(lambda: ks_serial(df, "v", "g", "a", "b"))
    t_dist, v2 = timed(lambda: C.ks_two_sample(df, "v", "g", "a", "b"))
    assert v1 == v2
    out = {"cpus": cpus, "serial": round(t_ser, 3),
           "dist": round(t_dist, 3)}
    print("LEG " + json.dumps(out), flush=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--leg", type=int, default=None,
                    help="internal: run one scaling leg at N cpus")
    ap.add_argument("--leg-rows", type=int, default=6_000_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    if args.leg:
        _scaling_leg(args.leg, args.leg_rows)
        return

    from schema_guru_spark.operators import constraints as C
    from schema_guru_spark.session import get_spark
    spark = get_spark("ks-compare", master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus, 8))

    li = spark.read.parquet(f"{args.sf_dir}/lineitem.parquet")
    cases = [
        ("lineitem l_quantity (50 distinct)",
         lambda: li, "l_quantity", "l_linestatus", "O", "F"),
        ("lineitem l_extendedprice (~" +
         str(li.select("l_extendedprice").distinct().count()) + " distinct)",
         lambda: li, "l_extendedprice", "l_linestatus", "O", "F"),
        ("synthetic continuous 2M rows (~2M distinct)",
         lambda: synth_continuous(spark, 2_000_000).localCheckpoint(),
         "v", "g", "a", "b"),
        ("synthetic continuous 8M rows (~8M distinct)",
         lambda: synth_continuous(spark, 8_000_000).localCheckpoint(),
         "v", "g", "a", "b"),
    ]

    lines = [
        "# REGRESSION r03 — exact-KS plan trade demonstrated",
        "",
        "r02 accepted a 1.5-1.9x regression on `ks_quantity_linestatus` "
        "(50 distinct values) as the cost of replacing the serial "
        "global-window CDF with the distributed range-bucketed "
        "prefix-sum. The claim was that the serial plan stops scaling "
        "the moment the pooled distinct count grows; this run pins it "
        "with data.",
        "",
        f"local[{args.cpus}], warm best-of-2 (first run discarded), "
        f"sf dir {args.sf_dir}. Both plans are EXACT and agree on every "
        "statistic below.",
        "",
        "| case | serial r01 (s) | distributed r02 (s) | r02/r01 | ks_stat |",
        "|---|---|---|---|---|",
    ]
    for name, mk, vc, gc, a, b in cases:
        df = mk()
        t_ser, v_ser = timed(lambda: ks_serial(df, vc, gc, a, b))
        t_dist, v_dist = timed(lambda: C.ks_two_sample(df, vc, gc, a, b))
        assert v_ser == v_dist, (name, v_ser, v_dist)
        ratio = t_dist / t_ser
        lines.append(f"| {name} | {t_ser:.3f} | {t_dist:.3f} "
                     f"| {ratio:.2f} | {v_dist} |")
        print(lines[-1], flush=True)

    # scaling dimension: the serial plan's window is ONE task by
    # construction, so added cores cannot help it; fresh subprocess per
    # leg (bench_scaling.py methodology)
    spark.stop()
    import json as _json
    import subprocess
    legs = []
    for cpus in (4, 16):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--leg", str(cpus), "--leg-rows", str(args.leg_rows)],
            capture_output=True, text=True, check=True)
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("LEG ")][-1]
        legs.append(_json.loads(line[4:]))
        print(line, flush=True)
    l4, l16 = legs
    lines += [
        "",
        f"## Scaling (synthetic continuous, {args.leg_rows:,} rows, "
        "fresh JVM per leg)",
        "",
        "| plan | local[4] (s) | local[16] (s) | speedup 4->16 |",
        "|---|---|---|---|",
        f"| serial r01 | {l4['serial']:.3f} | {l16['serial']:.3f} "
        f"| {l4['serial'] / l16['serial']:.2f}x |",
        f"| distributed r02 | {l4['dist']:.3f} | {l16['dist']:.3f} "
        f"| {l4['dist'] / l16['dist']:.2f}x |",
        "",
        "Reading: at 50 distinct values the distributed plan pays its "
        "fixed exchange latency for nothing (the accepted r02 "
        "regression, now narrowed by materializing the per-value "
        "reduction once); at high distinct counts the two plans are "
        "at parity on wall-clock for THIS host's core budget — but the "
        "scaling table is the point: the serial plan's CDF stage is one "
        "task by construction, so its speedup from added cores flattens "
        "immediately, while the distributed plan keeps converting cores "
        "into throughput. On a 1000-executor cluster the serial plan "
        "caps at single-core sort speed over the full distinct-value "
        "frame; the distributed plan partitions it. "
        "`ks_two_sample_sketch` remains the 100 TB default (one "
        "aggregation pass, no per-distinct shuffle).",
        "",
    ]
    if args.write:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "ks_compare_last_run.md")
        with open(out, "w") as f:
            f.write("\n".join(lines))
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
