"""Pinned semantics for q_pack_bestfit (rows-only operator - no DuckDB
oracle, so the contract is pinned HERE against a pure-Python BFD
reference plus the packing invariants)."""

from __future__ import annotations

from pudatalake_spark.llmops.pipeline import (
    BFD_CAP,
    BFD_SHARDS,
    HASH_A,
    HASH_B,
    HASH_P,
    q_pack_bestfit,
)

SF = "/root/testdata/sf0.001"


def _reference(rows):
    """Pure-Python BFD over (doc_id, n_tok) rows of ONE shard."""
    rows = sorted(rows, key=lambda r: (-r[1], r[0]))
    fills: list[int] = []
    out = {}
    for doc_id, t in rows:
        best, best_fill = -1, -1
        for i, f in enumerate(fills):
            if f + t <= BFD_CAP and f > best_fill:
                best, best_fill = i, f
        if best < 0:
            best = len(fills)
            fills.append(0)
        fills[best] += t
        out[doc_id] = best
    return out, fills


def _collect(spark):
    return {
        r["doc_id"]: (r["shard"], r["n_tok"], r["bin_id"], r["bin_fill"])
        for r in q_pack_bestfit(spark, SF).collect()
    }


def test_matches_python_reference_and_invariants(spark):
    got = _collect(spark)
    assert len(got) == 500  # every doc packed exactly once
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for doc_id, (shard, n_tok, _, _) in got.items():
        assert shard == (doc_id * HASH_A + HASH_B) % HASH_P % BFD_SHARDS
        by_shard.setdefault(shard, []).append((doc_id, n_tok))
    for shard, rows in by_shard.items():
        ref_assign, ref_fills = _reference(rows)
        for doc_id, _ in rows:
            assert got[doc_id][2] == ref_assign[doc_id], (shard, doc_id)
            assert got[doc_id][3] == ref_fills[ref_assign[doc_id]]
        # capacity invariant + BFD is never worse than greedy append
        assert all(f <= BFD_CAP for f in ref_fills)
        greedy_bins, fill = 1, 0
        for _, t in sorted(rows):  # arrival order = doc_id order
            if fill + t > BFD_CAP:
                greedy_bins, fill = greedy_bins + 1, 0
            fill += t
        assert len(ref_fills) <= greedy_bins, shard


def test_deterministic_across_runs(spark):
    assert _collect(spark) == _collect(spark)
