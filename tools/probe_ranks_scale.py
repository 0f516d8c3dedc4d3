#!/usr/bin/env python
"""Synthetic scale probe for operators/ranks.global_order (VERDICT r7
ask #4): no testdata needed - spark.range builds 10x and 100x the
sf0.1 lineitem row count (600k -> 6M / 60M) with a Zipf-skewed order
column, and we measure

  1. wall-clock of the bucketed two-pass global rank vs the old
     ``Window.orderBy`` single-partition plan at each size,
  2. bucket balance (max/mean bucket size) under skew,
  3. the worst case: an ALL-EQUAL order column (ties must co-bucket,
     so every row lands in ONE bucket and the helper degenerates to
     the single-task plan it replaces).

Usage: python tools/probe_ranks_scale.py [sizes...]  (default 6M 60M)
Results are recorded in SCALING.md §18.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window
from pyspark.sql import functions as F

from pudatalake_spark.operators import ranks
from pudatalake_spark.session import get_spark


def synth(spark, n: int, skew: str):
    """Deterministic synthetic frame: id + an order column.

    skew='zipf': v = 10^6 / (1 + xxhash64(id) % 1000) - a heavy-tailed
    value distribution where ~0.1% of rows share the single hottest
    value (rank-worthy skew, ties co-bucket by construction).
    skew='const': v = 0 for every row - the adversarial case.
    """
    df = spark.range(n)
    if skew == "zipf":
        v = (F.lit(1_000_000) / (
            F.lit(1) + F.pmod(F.xxhash64("id"), F.lit(1000))
        )).cast("bigint")
    else:
        v = F.lit(0).cast("bigint")
    return df.select("id", v.alias("v"))


def timed(fn, reps: int = 3) -> list[float]:
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 2))
    return out


def main() -> None:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [6_000_000, 60_000_000]
    spark = get_spark(app_name="probe-ranks-scale")
    spark.sparkContext.setLogLevel("ERROR")

    for n in sizes:
        base = synth(spark, n, "zipf").localCheckpoint(eager=False)
        base.count()  # materialize the input once, outside the timings

        # bucket balance under the zipf skew
        sizes_df = (
            ranks._bucketed(base, "v", ranks.RANK_BUCKETS)
            .groupBy("_b").count().select("count")
        )
        counts = [r["count"] for r in sizes_df.collect()]
        mx, mean = max(counts), statistics.mean(counts)
        print(
            f"n={n}: buckets={len(counts)} max/mean bucket = "
            f"{mx}/{mean:.0f} = {mx / mean:.2f} "
            f"(1.0 = perfectly equi-depth)"
        )

        def helper():
            (ranks.global_order(base, "v", [F.col("v"), F.col("id")],
                                rank_name="r")
             .agg(F.max("r"), F.min("r")).collect())

        def single():
            (base.withColumn(
                "r", F.row_number().over(Window.orderBy("v", "id")))
             .agg(F.max("r"), F.min("r")).collect())

        th = timed(helper)
        ts = timed(single)
        print(f"n={n}: global_order (bucketed) {th} s; "
              f"single-partition window {ts} s; "
              f"median speedup {statistics.median(ts) / statistics.median(th):.2f}x")

        # adversarial all-equal order column: every row -> bucket 0
        const = synth(spark, n, "const").localCheckpoint(eager=False)
        const.count()
        cc = [r["count"] for r in (
            ranks._bucketed(const, "v", ranks.RANK_BUCKETS)
            .groupBy("_b").count().select("count")
        ).collect()]
        tc = timed(lambda: (
            ranks.global_order(const, "v", [F.col("v"), F.col("id")],
                               rank_name="r")
            .agg(F.max("r"), F.min("r")).collect()
        ), reps=1)
        print(f"n={n}: ALL-EQUAL column -> {len(cc)} bucket(s), "
              f"largest={max(cc)} (single-task degeneration), "
              f"wall {tc} s")


if __name__ == "__main__":
    main()
