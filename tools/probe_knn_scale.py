#!/usr/bin/env python
"""1M-vector kNN-graph feasibility probe (VERDICT r11 #3).

SCALING §21 carries the kNN graph to 200 k vectors (474.9 s, recall
0.996) at the shipped 3-bit-per-band config; this probe pins the next
decade. Two measurements:

1. **The shipped bits=3 config at 1 M is a documented negative,
   computed not guessed**: bucket occupancy and candidate volume are
   computed exactly (numpy sign-hash + bincount — no Spark run
   needed), and the wall is projected from the measured 200 k point
   by the candidate-volume ratio. At 8 buckets/band the peak bucket
   is ~N/8 and volume stays quasi-quadratic — the binding constraint
   is GEMM flops, not memory (tiles stay 2048×4096).
2. **The scale config (KNN_BITS_PER_BAND=10, 1024 buckets/band) is
   MEASURED end-to-end**: full 1 M-vector graph build through the
   operator's own plan (monkeypatched bits constant — the documented
   dial), wall + peak bucket size + recall@5 against exact numpy
   ground truth on a deterministic 512-query sample (exact FULL-graph
   truth at 1 M is itself an N² job; the sample is the standard
   estimator).

Corpus: the §21 label-conditional gaussian generator at n=1,000,000
(pyarrow writer — the duckdb unnest path allocates ~5 GB of Python
lists at this size).

    python tools/probe_knn_scale.py [--bits 10] [--sample 512]

Appends JSONL to .scratch/sim_scale/knn_1m.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"
OUT_ROOT = os.path.join(REPO, ".scratch", "sim_scale")
N = 1_000_000
SEED = 20260816
X200K_WALL_S = 474.9  # SCALING §21 measured 200 k build (r11 config)
X200K_N = 200_000


def _flag(name: str, default: int) -> int:
    if name in sys.argv:
        return int(sys.argv[sys.argv.index(name) + 1])
    return default


def generate() -> str:
    """1M-vector corpus from the §21 label-conditional gaussians."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = os.path.join(OUT_ROOT, "x1m")
    path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(path):
        return out_dir
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
    rng = np.random.default_rng(SEED + N)
    labs = rng.choice(labels, size=N, p=weights)
    dim = len(next(iter(stats.values()))[0])
    embs = np.empty((N, dim), dtype=np.float32)
    for l in labels:
        idx = np.where(labs == l)[0]
        mu, sd = stats[l]
        embs[idx] = rng.normal(mu, sd, size=(len(idx), dim)).astype(
            np.float32
        )
    flat = pa.array(embs.reshape(-1))
    offsets = pa.array(
        np.arange(0, (N + 1) * dim, dim, dtype=np.int32)
    )
    tbl = pa.table({
        "vec_id": pa.array(np.arange(N, dtype=np.int64)),
        "embedding": pa.ListArray.from_arrays(offsets, flat),
        "label": pa.array(labs.astype(np.int32)),
    })
    pq.write_table(tbl, path)
    for f in os.listdir(BASE):
        if f.endswith(".parquet") and f != "embeddings.parquet":
            dst = os.path.join(out_dir, f)
            if not os.path.exists(dst):
                os.symlink(os.path.join(BASE, f), dst)
    return out_dir


def bucket_stats(embs: np.ndarray, bands: int, bits: int, probes: int) -> dict:
    """Exact bucket occupancy + candidate volume for a sign-hash
    config, straight from the corpus (same hash the operator
    computes JVM-side: bit j of band k = sign of dim bits*k+j)."""
    n = embs.shape[0]
    peak = 0
    volume = 0  # sum over (band,bucket) of probe_rows * index_rows
    for k in range(bands):
        block = embs[:, bits * k: bits * k + bits]
        weights = (1 << np.arange(bits - 1, -1, -1)).astype(np.int64)
        bucket = ((block > 0) @ weights).astype(np.int64)
        counts = np.bincount(bucket, minlength=1 << bits)
        peak = max(peak, int(counts.max()))
        # probe rows per bucket: own members + members of buckets
        # whose ranked flips land here; total probe rows = (1+probes)N
        # and flip targets share the same occupancy distribution to
        # first order, so volume ~ (1+probes) * sum(counts^2). Exact
        # enough for a projection (the measured arm is the real one).
        volume += (1 + probes) * int((counts.astype(np.int64) ** 2).sum())
    return {"peak_bucket": peak, "cand_volume": volume}


def main() -> None:
    bits = _flag("--bits", 10)
    n_sample = _flag("--sample", 512)
    out_dir = generate()
    print(f"corpus: {N} vectors at {out_dir}", flush=True)

    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(out_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = t["vec_id"].to_numpy()
    embs = np.asarray(t["embedding"].combine_chunks().flatten()).reshape(
        len(ids), -1
    )
    sink = open(os.path.join(OUT_ROOT, "knn_1m.jsonl"), "a")

    def emit(rec):
        sink.write(json.dumps(rec) + "\n")
        sink.flush()
        print(json.dumps(rec), flush=True)

    from pudatalake_spark import registry
    from pudatalake_spark.llmops import similarity as sim
    from pudatalake_spark.session import get_spark

    registry.load_all()

    # Arm 1: the shipped bits=3 config, projected (documented negative)
    s3 = bucket_stats(embs, sim.KNN_GRAPH_BANDS, 3, sim.KNN_PROBES)
    s200 = bucket_stats(
        embs[:X200K_N], sim.KNN_GRAPH_BANDS, 3, sim.KNN_PROBES
    )
    projected = round(X200K_WALL_S * s3["cand_volume"] / s200["cand_volume"])
    emit({
        "arm": "bits3_projected", "n_vecs": N, "bits": 3,
        **s3,
        "projected_wall_s": projected,
        "basis": f"measured 200k wall {X200K_WALL_S}s x volume ratio "
                 f"{s3['cand_volume'] / s200['cand_volume']:.1f}",
    })

    # Arm 2: bits=10, measured end-to-end through the operator's plan
    spark = get_spark(app_name="knn-1m")
    spark.sparkContext.setLogLevel("ERROR")
    graph_path = os.path.join(OUT_ROOT, "x1m_graph")
    sN = bucket_stats(embs, sim.KNN_GRAPH_BANDS, bits, sim.KNN_PROBES)
    old_bits = sim.KNN_BITS_PER_BAND
    sim.KNN_BITS_PER_BAND = bits
    try:
        t0 = time.time()
        registry.QUERIES["q_sim_knn_graph"](spark, out_dir).write.mode(
            "overwrite"
        ).parquet(graph_path)
        wall = round(time.time() - t0, 1)
    finally:
        sim.KNN_BITS_PER_BAND = old_bits
        registry.clear_caches(spark)

    # recall@5 on a deterministic query sample vs exact numpy truth
    rng = np.random.default_rng(SEED)
    sample = np.sort(rng.choice(len(ids), size=n_sample, replace=False))
    A = embs.astype(np.float64)
    A /= np.linalg.norm(A, axis=1, keepdims=True)
    got: dict[int, set] = {}
    import pyarrow.dataset as ds

    gt = ds.dataset(graph_path).to_table(
        filter=ds.field("src").isin([int(ids[i]) for i in sample]),
        columns=["src", "dst"],
    )
    for s, d in zip(gt["src"].to_numpy(), gt["dst"].to_numpy()):
        got.setdefault(int(s), set()).add(int(d))
    hits = tot = 0
    k = sim.KNN_GRAPH_K
    for i in sample:
        scores = A[i] @ A.T
        scores[i] = -np.inf
        top = {int(ids[j]) for j in np.argpartition(-scores, k)[:k]}
        hits += len(top & got.get(int(ids[i]), set()))
        tot += k
    emit({
        "arm": f"bits{bits}_measured", "n_vecs": N, "bits": bits,
        "probes": sim.KNN_PROBES, "bands": sim.KNN_GRAPH_BANDS,
        **sN,
        "wall_s": wall,
        "recall_at_5": round(hits / tot, 4),
        "n_sample_queries": n_sample,
        "graph_rows": ds.dataset(graph_path).count_rows(),
    })


if __name__ == "__main__":
    main()
