"""q_sim_threshold_pairs' r10 GEMM filter-and-refine plan (SCALING
§23a): the fixture's labels are small enough that every tile is a
DIAGONAL tile (one block per label), so the driver sweep never
exercises the cross-tile branch. These tests pin both branches
against each other and against a numpy brute-force reference, so a
testdata regeneration or a block-size change can't silently break
either path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pudatalake_spark import registry
from pudatalake_spark.llmops import similarity as S
from tests.conftest import SF_DIR

registry.load_all()


def _run(spark) -> pd.DataFrame:
    out = (
        registry.QUERIES["q_sim_threshold_pairs"](spark, SF_DIR)
        .toPandas()
        .sort_values(["label", "vec1", "vec2"])
        .reset_index(drop=True)
    )
    return out


def _brute(sf_dir: str) -> pd.DataFrame:
    """All same-label pairs with round(cos, 6) >= tau, in float64,
    straight from the parquet — no Spark, no DuckDB."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, label, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    labs = np.array([r[1] for r in rows])
    V = np.array([r[2] for r in rows], dtype=np.float64)
    nrm = np.sqrt((V * V).sum(axis=1))
    recs = []
    for lab in np.unique(labs):
        idx = np.where(labs == lab)[0]
        cos = (V[idx] @ V[idx].T) / np.outer(nrm[idx], nrm[idx])
        iu, ju = np.triu_indices(len(idx), k=1)
        keep = np.round(cos[iu, ju], 6) >= S.COS_TAU
        for i, j, c in zip(idx[iu[keep]], idx[ju[keep]], cos[iu, ju][keep]):
            recs.append((int(lab), int(ids[i]), int(ids[j]), round(float(c), 6)))
    return (
        pd.DataFrame(recs, columns=["label", "vec1", "vec2", "cos_sim"])
        .sort_values(["label", "vec1", "vec2"])
        .reset_index(drop=True)
    )


def test_cross_tile_path_matches_diagonal_path(spark, monkeypatch):
    """Forcing GEMM_BLOCK=16 splits every label into many blocks so
    cross tiles dominate; the output must be identical to the
    default single-diagonal-tile plan."""
    base = _run(spark)
    monkeypatch.setattr(S, "GEMM_BLOCK", 16)
    forced = _run(spark)
    pd.testing.assert_frame_equal(base, forced)


def test_matches_numpy_brute_force(spark):
    """Pair set identical to the brute-force reference; scores equal
    to 6 dp (the emitted value is the JVM fold, the reference is a
    numpy GEMM — they may differ in the last ulp BEFORE rounding,
    never after at this margin)."""
    got = _run(spark)
    ref = _brute(SF_DIR)
    assert list(got.columns) == ["label", "vec1", "vec2", "cos_sim"]
    pd.testing.assert_frame_equal(
        got[["label", "vec1", "vec2"]].astype("int64"),
        ref[["label", "vec1", "vec2"]].astype("int64"),
    )
    assert np.allclose(got["cos_sim"], ref["cos_sim"], atol=2e-6)


def test_margin_dwarfs_summation_drift(spark):
    """The lossless-prefilter claim quantified on real data: the max
    |GEMM - JVM fold| gap over every emitted pair must be orders of
    magnitude below GEMM_MARGIN."""
    got = _run(spark)
    ref = _brute(SF_DIR)
    gap = float(np.abs(got["cos_sim"].to_numpy() - ref["cos_sim"].to_numpy()).max())
    # both sides are rounded to 6 dp, so agreement there bounds the
    # pre-round drift by 1e-6 + true drift; the margin is 1e-4
    assert gap <= S.GEMM_MARGIN / 10


def _run_knn(spark) -> pd.DataFrame:
    return (
        registry.QUERIES["q_sim_knn_graph"](spark, SF_DIR)
        .toPandas()
        .sort_values(["src", "rank"])
        .reset_index(drop=True)
    )


def test_knn_multi_tile_path_matches_single_tile(spark, monkeypatch):
    """q_sim_knn_graph's tiled candidate generation: at the default
    KNN_TILE_Q=2048 / KNN_TILE_I=4096 every fixture bucket fits one
    tile, so the qc/ic chunk-spine joins and the per-tile cut across
    a SPLIT bucket never execute in the sweep. Forcing 16-row tiles
    splits every bucket into many tiles on both sides; the emitted
    graph must be identical (the per-tile top-K cut is per-probe and
    the JVM rescore + window is global, so tiling is invisible)."""
    base = _run_knn(spark)
    monkeypatch.setattr(S, "KNN_TILE_Q", 16)
    monkeypatch.setattr(S, "KNN_TILE_I", 16)
    forced = _run_knn(spark)
    pd.testing.assert_frame_equal(base, forced)
