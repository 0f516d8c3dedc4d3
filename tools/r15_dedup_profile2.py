#!/usr/bin/env python
"""Finer decomposition: near_minhash tail (banded/cand/verify) and
near_jaccard internals (rare self-join agg, hd branch, mask joins).

    python tools/r15_dedup_profile2.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pudatalake_spark import registry
from pudatalake_spark.session import get_spark
from pudatalake_spark.loaders import cached, spread, table
from pudatalake_spark.llmops import dedup
from pudatalake_spark.llmops.dedup import (
    HOT_DF_MIN, HOT_DF_FRAC, HOT_DICT_MAX, _MASK_WORDS, _mask_word,
    JACCARD_TAU, SHINGLE_LEN,
)
from pyspark.sql import Window
from pyspark.sql import functions as F


def _steal():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return sum(v), v[7]


def timed(spark, name, build_fn, reps=3):
    runs = []
    build_fn().write.format("noop").mode("overwrite").save()  # cold
    registry.clear_caches(spark)
    for _ in range(reps):
        s0 = _steal()
        t0 = time.perf_counter()
        build_fn().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        s1 = _steal()
        st = 100.0 * (s1[1] - s0[1]) / max(1, s1[0] - s0[0])
        runs.append((round(dt, 3), round(st, 2)))
        registry.clear_caches(spark)
    med = statistics.median(r[0] for r in runs)
    print(f"{name:45s} med {med:7.3f}s  runs={runs}", flush=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="r15-dedup-profile2")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    d = spread(table(spark, sf_dir, "documents"), "doc_id")

    # ---- minhash sub-stages (exactly the shipped shapes) ----------
    def mk_frames():
        return dedup.minhash_signature_frames(d)

    timed(spark, "mh.a sh cached alone", lambda: mk_frames()[0])
    timed(spark, "mh.b banded (fills sh+banded caches)",
          lambda: mk_frames()[1])

    def mk_cand():
        sh, banded = mk_frames()
        a, b = banded.alias("a"), banded.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc1"),
                    F.col("b.doc_id").alias("doc2"))
            .distinct()
        )

    timed(spark, "mh.c cand (band self-join)", mk_cand)
    timed(spark, "mh.d minhash_verified_pairs full",
          lambda: dedup.minhash_verified_pairs(d, JACCARD_TAU))

    # ---- near_jaccard sub-stages (inlined body with cut points) ---
    def nj_parts():
        t = F.lower(F.col("text"))
        pos = d.select(
            "doc_id", t.alias("t"),
            F.explode(
                F.when(
                    F.length(t) >= SHINGLE_LEN,
                    F.sequence(F.lit(1), F.length(t) - (SHINGLE_LEN - 1)),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("i"),
        )
        inst0 = cached(
            pos.select(
                "doc_id",
                F.xxhash64(F.expr(f"substring(t, i, {SHINGLE_LEN})")).alias("shingle"),
            ).distinct()
        )
        ns = inst0.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
        inst = inst0.join(ns, "doc_id").select("doc_id", "n_sh", "shingle")
        n_docs = d.agg(F.count("*").alias("n_docs"))
        hotdict = (
            inst0.groupBy("shingle").agg(F.count("*").alias("df"))
            .join(F.broadcast(n_docs))
            .filter(F.col("df") > F.greatest(F.lit(HOT_DF_MIN), F.lit(HOT_DF_FRAC) * F.col("n_docs")))
            .withColumn("idx", F.row_number().over(Window.orderBy(F.col("df").desc(), F.col("shingle"))) - 1)
            .filter(F.col("idx") < HOT_DICT_MAX)
            .select("shingle", "idx")
        )
        flagged = cached(inst.join(F.broadcast(hotdict), "shingle", "left"))
        rare = flagged.filter(F.col("idx").isNull())
        masks = (
            flagged.filter(F.col("idx").isNotNull())
            .groupBy("doc_id")
            .agg(*[_mask_word(w) for w in range(_MASK_WORDS)],
                 F.count("*").alias("hot_cnt"))
        )
        return ns, inst, flagged, rare, masks

    timed(spark, "nj.a flagged cached (inst+hotdict tag)",
          lambda: nj_parts()[2])
    timed(spark, "nj.b masks (hot bitmap agg)", lambda: nj_parts()[4])

    def mk_rare_pairs():
        ns, inst, flagged, rare, masks = nj_parts()
        a, b = rare.alias("a"), rare.alias("b")
        cond = (
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.n_sh") >= JACCARD_TAU * F.col("b.n_sh"))
            & (F.col("b.n_sh") >= JACCARD_TAU * F.col("a.n_sh"))
        )
        return (
            a.join(b, cond)
            .groupBy(
                F.col("a.doc_id").alias("doc1"),
                F.col("b.doc_id").alias("doc2"),
                F.col("a.n_sh").alias("n1"),
                F.col("b.n_sh").alias("n2"),
            )
            .agg(F.count("*").alias("rare_inter"))
        )

    timed(spark, "nj.c rare self-join + 4-key pair agg", mk_rare_pairs)

    def mk_rare_pairs_narrow():
        ns, inst, flagged, rare, masks = nj_parts()
        a, b = rare.alias("a"), rare.alias("b")
        cond = (
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.n_sh") >= JACCARD_TAU * F.col("b.n_sh"))
            & (F.col("b.n_sh") >= JACCARD_TAU * F.col("a.n_sh"))
        )
        return (
            a.join(b, cond)
            .groupBy(
                F.col("a.doc_id").alias("doc1"),
                F.col("b.doc_id").alias("doc2"),
            )
            .agg(F.count("*").alias("rare_inter"))
        )

    timed(spark, "nj.c' rare self-join + 2-KEY pair agg",
          mk_rare_pairs_narrow)
    timed(spark, "nj.d near_jaccard_pairs full",
          lambda: dedup.near_jaccard_pairs(d, JACCARD_TAU))


if __name__ == "__main__":
    main()
