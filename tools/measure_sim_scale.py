#!/usr/bin/env python
"""Measure the similarity/ANN family at 10x and 100x the sf0.1
embedding count (r9, extending SCALING.md §20's measured-not-argued
discipline to the second N²-risk family).

Corpus: label-conditional gaussians fitted to the sf0.1 fixture
(per-label mean/std over the 64 dims), sampled at 20k and 200k
vectors with the fixture's label distribution — so cluster structure
(what IVF exploits and what recall depends on) is preserved while N
scales. Deterministic; vec_ids disjoint from the fixture's.

Measured keys: q_sim_cosine_topk (broadcast brute force — the linear
baseline), q_sim_ann_ivf / q_sim_ann_lsh (the sub-linear scale
paths), q_sim_knn_label (probe-side brute force), and
q_sim_threshold_pairs at 20k ONLY (N² by contract — the point is the
wall, not the time).

Output: JSONL appended incrementally (results survive a crash), one
line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"
OUT_ROOT = os.path.join(REPO, ".scratch", "sim_scale")
SIZES = {"x10": 20_000, "x100": 200_000}
SEED = 20260816


def generate(n: int, out_dir: str) -> str:
    path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT label, embedding FROM "
        f"read_parquet('{BASE}/embeddings.parquet')"
    ).fetchall()
    by_label: dict[int, list] = {}
    for lab, emb in rows:
        by_label.setdefault(lab, []).append(emb)
    labels = sorted(by_label)
    weights = np.array([len(by_label[l]) for l in labels], dtype=float)
    weights /= weights.sum()
    stats = {
        l: (np.mean(by_label[l], axis=0), np.std(by_label[l], axis=0))
        for l in labels
    }
    rng = np.random.default_rng(SEED + n)
    labs = rng.choice(labels, size=n, p=weights)
    dim = len(next(iter(stats.values()))[0])
    embs = np.empty((n, dim), dtype=np.float32)
    for l in labels:
        idx = np.where(labs == l)[0]
        mu, sd = stats[l]
        embs[idx] = rng.normal(mu, sd, size=(len(idx), dim)).astype(
            np.float32
        )
    con.execute(
        "CREATE TABLE t AS SELECT unnest($1::BIGINT[]) AS vec_id, "
        "unnest($2::FLOAT[][]) AS embedding, "
        "unnest($3::INT[]) AS label",
        [list(range(n)),  # ids from 0: the sim keys take vec_id<K as the query set
         [e.tolist() for e in embs], [int(x) for x in labs]],
    )
    con.execute(
        f"COPY (SELECT * FROM t ORDER BY vec_id) TO '{path}' "
        "(FORMAT PARQUET)"
    )
    for f in os.listdir(BASE):
        if f.endswith(".parquet") and f != "embeddings.parquet":
            dst = os.path.join(out_dir, f)
            if not os.path.exists(dst):
                os.symlink(os.path.join(BASE, f), dst)
    return path


def main() -> None:
    for tag, n in SIZES.items():
        p = generate(n, os.path.join(OUT_ROOT, tag))
        print(f"corpus {tag}: {n} vectors at {p}", flush=True)
    if "--gen-only" in sys.argv:
        return

    from pudatalake_spark import registry
    from pudatalake_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="sim-scale")
    spark.sparkContext.setLogLevel("ERROR")
    sink = open(os.path.join(OUT_ROOT, "results.jsonl"), "a")

    def emit(rec):
        sink.write(json.dumps(rec) + "\n")
        sink.flush()
        print(json.dumps(rec), flush=True)

    # warm the session once on the fixture
    registry.QUERIES["q_sim_cosine_topk"](spark, BASE).count()
    for tag, n in SIZES.items():
        sf_dir = os.path.join(OUT_ROOT, tag)
        keys = ["q_sim_cosine_topk", "q_sim_ann_ivf", "q_sim_ann_lsh",
                "q_sim_knn_label",
                # r10: trained PQ — train (3 broadcast-join passes over
                # N×K×SUBS rows) + encode are linear in N; the ADC
                # probe itself is a flat broadcast-LUT map. At real
                # scale the trainer runs on a bounded SAMPLE (the
                # FAISS convention), so the linear term is capped too.
                "q_sim_pq_adc"]
        if n <= 20_000:
            keys.append("q_sim_threshold_pairs")  # N^2 by contract
        for key in keys:
            t0 = time.time()
            try:
                rows = registry.QUERIES[key](spark, sf_dir).count()
                emit({"corpus": tag, "n_vecs": n, "key": key,
                      "wall_s": round(time.time() - t0, 2),
                      "out_rows": rows})
            except Exception as e:
                emit({"corpus": tag, "n_vecs": n, "key": key,
                      "wall_s": round(time.time() - t0, 2),
                      "error": str(e)[:300]})


if __name__ == "__main__":
    main()
