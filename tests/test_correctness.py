"""Pytest mirror of the driver's t2 gate (SURVEY §5.2): every
registered query with an oracle runs on Spark AND DuckDB at sf0.001
and must match exactly after canonicalization. Keys without an oracle
get the rows-only check (runs, stable schema, >= 0 rows)."""

from __future__ import annotations

import pytest

from pudatalake_spark import registry

from tests.conftest import SF_DIR, assert_frames_match

registry.load_all()
ORACLED = sorted(k for k in registry.QUERIES if k in registry.ORACLES)
ROWS_ONLY = sorted(k for k in registry.QUERIES if k not in registry.ORACLES)

# Streaming keys are exercised in test_streaming.py (slow path).
_STREAMING = {k for k in ROWS_ONLY if k.startswith("s_")}


@pytest.mark.parametrize("key", ORACLED)
def test_vs_duckdb(spark, duck, key):
    sdf = registry.QUERIES[key](spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    duck_pdf = duck.execute(registry.ORACLES[key]).df()
    assert_frames_match(spark_pdf, duck_pdf, key)


@pytest.mark.parametrize("key", sorted(set(ROWS_ONLY) - _STREAMING))
def test_rows_only(spark, key):
    sdf = registry.QUERIES[key](spark, SF_DIR)
    n = sdf.count()
    assert n >= 0
    assert len(sdf.schema.fields) > 0


def test_minhash_matches_exact_jaccard(spark):
    """q_dedup_near_minhash quality gate: its verified output must be
    FP-free against the exact-Jaccard truth (guaranteed by the exact
    verify on full shingle sets) and must find every planted near-dup
    (recall 1.0 on this fixture - banding miss probability at the
    planted J~0.9 is ~1%, observed 0)."""
    mh = registry.QUERIES["q_dedup_near_minhash"](spark, SF_DIR)
    jc = registry.QUERIES["q_dedup_near_jaccard"](spark, SF_DIR)
    m = {(r.doc1, r.doc2) for r in mh.collect()}
    j = {(r.doc1, r.doc2) for r in jc.collect()}
    assert m - j == set(), f"false positives: {sorted(m - j)[:5]}"
    assert j - m == set(), f"missed near-dups: {sorted(j - m)[:5]}"
