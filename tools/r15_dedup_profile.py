#!/usr/bin/env python
"""Layer-by-layer decomposition of the dedup-family cost at sf0.1
(guide §1: measure first). Times each sub-pipeline of
minhash_verified_pairs and near_jaccard_pairs with the noop sink so
the r15 optimization targets the ACTUAL dominant stage, not the
assumed one.

    python tools/r15_dedup_profile.py [sf_dir]

Each layer is timed on a fresh cache (clear_caches between layers);
per-layer steal%% recorded so contaminated numbers self-describe.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pudatalake_spark import registry
from pudatalake_spark.session import get_spark
from pudatalake_spark.loaders import spread, table
from pudatalake_spark.llmops import dedup
from pyspark.sql import functions as F


def _steal():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return sum(v), v[7]


def timed(spark, name, df, reps=3):
    import statistics
    runs = []
    df.write.format("noop").mode("overwrite").save()  # cold
    for _ in range(reps):
        registry.clear_caches(spark)
        s0 = _steal()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        s1 = _steal()
        st = 100.0 * (s1[1] - s0[1]) / max(1, s1[0] - s0[0])
        runs.append((round(dt, 3), round(st, 2)))
    med = statistics.median(r[0] for r in runs)
    print(f"{name:45s} med {med:7.3f}s  runs={runs}", flush=True)
    registry.clear_caches(spark)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="r15-dedup-profile")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    d = spread(table(spark, sf_dir, "documents"), "doc_id")

    # --- minhash_verified_pairs layers -------------------------------
    sh = d.select("doc_id", dedup._hashed_shingles_col().alias("s"))
    timed(spark, "mh.1 sh arrays (HOF build)", sh)
    ex = sh.select(
        "doc_id",
        F.explode(F.filter("s", lambda h: h.bitwiseAND(F.lit(3)) == 0)).alias("h"),
    )
    timed(spark, "mh.2 sh + sampled explode", ex)
    h1 = F.shiftrightunsigned(F.col("h"), 33)
    h2 = F.shiftrightunsigned(F.xxhash64(F.col("h")), 33)
    sig = ex.select("doc_id", h1.alias("h1"), h2.alias("h2")).groupBy("doc_id").agg(
        *[
            F.min(
                F.pmod(
                    F.shiftrightunsigned(F.xxhash64(F.lit(i)), 33) * F.col("h2")
                    + F.col("h1"),
                    F.lit(dedup._P31),
                )
            ).alias(f"m{i}")
            for i in range(dedup.N_HASHES)
        ]
    )
    timed(spark, "mh.3 sh + explode + 64 min-aggs", sig)
    # Flat-explode alternative for the signature feed (no arrays, no
    # distinct - min is duplicate-insensitive):
    t = F.lower(F.col("text"))
    pos = d.select(
        "doc_id",
        t.alias("t"),
        F.explode(
            F.when(
                F.length(t) >= dedup.SHINGLE_LEN,
                F.sequence(F.lit(1), F.length(t) - (dedup.SHINGLE_LEN - 1)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("i"),
    )
    flat = pos.select(
        "doc_id",
        F.xxhash64(F.expr(f"substring(t, i, {dedup.SHINGLE_LEN})")).alias("h"),
    ).filter(F.col("h").bitwiseAND(F.lit(3)) == 0)
    timed(spark, "mh.2' FLAT sampled instance feed", flat)
    sig2 = flat.select("doc_id", h1.alias("h1"), h2.alias("h2")).groupBy("doc_id").agg(
        *[
            F.min(
                F.pmod(
                    F.shiftrightunsigned(F.xxhash64(F.lit(i)), 33) * F.col("h2")
                    + F.col("h1"),
                    F.lit(dedup._P31),
                )
            ).alias(f"m{i}")
            for i in range(dedup.N_HASHES)
        ]
    )
    timed(spark, "mh.3' FLAT + 64 min-aggs", sig2)
    # collect_set array build over the flat instance feed (shuffle on
    # doc_id already satisfied by spread()): candidate replacement for
    # the HOF sh arrays where full-corpus sets are genuinely needed.
    flat_all = pos.select(
        "doc_id",
        F.xxhash64(F.expr(f"substring(t, i, {dedup.SHINGLE_LEN})")).alias("h"),
    )
    cs = flat_all.groupBy("doc_id").agg(F.collect_set("h").alias("s"))
    timed(spark, "mh.1' collect_set array build", cs)
    # full key for reference
    timed(spark, "mh.4 q_dedup_near_minhash (full)",
          registry.QUERIES["q_dedup_near_minhash"](spark, sf_dir))

    # --- near_jaccard layers ----------------------------------------
    t2 = F.lower(F.col("text"))
    pos2 = d.select(
        "doc_id",
        t2.alias("t"),
        F.explode(
            F.when(
                F.length(t2) >= dedup.SHINGLE_LEN,
                F.sequence(F.lit(1), F.length(t2) - (dedup.SHINGLE_LEN - 1)),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("i"),
    )
    inst0 = pos2.select(
        "doc_id",
        F.xxhash64(F.expr(f"substring(t, i, {dedup.SHINGLE_LEN})")).alias("shingle"),
    ).distinct()
    timed(spark, "nj.1 inst0 (flat explode+distinct)", inst0)
    ns = inst0.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inst = inst0.join(ns, "doc_id").select("doc_id", "n_sh", "shingle")
    timed(spark, "nj.2 inst (+n_sh join)", inst)
    # rare self-join + pair agg: time the candidate build through the
    # public function with a count-only projection? No - use the full
    # key to bound, then the pair frame directly.
    pairs = dedup.near_jaccard_pairs(d, dedup.JACCARD_TAU)
    timed(spark, "nj.3 near_jaccard_pairs (full)", pairs)
    timed(spark, "nj.4 q_dedup_cross_corpus (full)",
          registry.QUERIES["q_dedup_cross_corpus"](spark, sf_dir))


if __name__ == "__main__":
    main()
