"""q_sim_mmr quality gate: the distributed greedy MMR must equal an
independently-written single-process reference (raw parquet -> numpy
cosine -> same pool/tie rules -> pure-Python greedy loop). This is
the algorithmic pin for a key with no SQL oracle by design."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from pudatalake_spark import registry
from pudatalake_spark.llmops.similarity import (
    MMR_K,
    MMR_LAMBDA,
    MMR_POOL,
    MMR_QUERIES,
)

from tests.conftest import SF_DIR

registry.load_all()


def _reference(sf_dir: str) -> list[tuple[int, int, int, float]]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    ids = np.array(t["vec_id"])
    vecs = np.array([list(v) for v in t["embedding"]], dtype=np.float64)
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    nrm = np.sqrt((vecs * vecs).sum(axis=1))
    out = []
    for qi in range(MMR_QUERIES):
        qmask = ids == qi
        qv, qn = vecs[qmask][0], nrm[qmask][0]
        cmask = ids >= MMR_QUERIES
        cids, cvecs, cnrm = ids[cmask], vecs[cmask], nrm[cmask]
        rel = np.round(cvecs @ qv / (cnrm * qn), 6)
        pool = np.lexsort((cids, -rel))[:MMR_POOL]
        pids, pvecs, pnrm, prel = cids[pool], cvecs[pool], cnrm[pool], rel[pool]
        picked: list[int] = []
        for rank in range(1, min(MMR_K, len(pids)) + 1):
            best, best_key = -1, None
            for i in range(len(pids)):
                if i in picked:
                    continue
                if picked:
                    sims = [
                        pvecs[i] @ pvecs[j] / (pnrm[i] * pnrm[j])
                        for j in picked
                    ]
                    ms = max(sims)
                else:
                    ms = 0.0
                score = round(
                    MMR_LAMBDA * prel[i] - (1 - MMR_LAMBDA) * ms, 6
                )
                key = (-score, pids[i])
                if best_key is None or key < best_key:
                    best, best_key = i, key
            picked.append(best)
            out.append((qi, rank, int(pids[best]), -best_key[0]))
    return out


def test_mmr_matches_reference(spark):
    got = {
        (r.query_id, r.rank): (r.vec_id, round(r.mmr_score, 6))
        for r in registry.QUERIES["q_sim_mmr"](spark, SF_DIR).collect()
    }
    want = {
        (q, rank): (vid, round(score, 6))
        for q, rank, vid, score in _reference(SF_DIR)
    }
    assert got == want
