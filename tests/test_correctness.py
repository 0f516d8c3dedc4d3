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
