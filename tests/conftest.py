"""Shared fixtures: one SparkSession + one DuckDB connection per
test session, both over /root/testdata/sf0.001 (the pytest mirror of
the driver's t2 gate, SURVEY §5.2)."""

from __future__ import annotations

import datetime

import duckdb
import numpy as np
import pandas as pd
import pytest

from pudatalake_spark.loaders import TABLES
from pudatalake_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pudl-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon_scalar(v):
    """Canonical string for one value; midnight timestamps and dates
    collapse to the same representation (DATE vs TIMESTAMP-at-midnight
    round-trips differ between the two engines' pandas output)."""
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, float):
        if np.isnan(v):
            return "∅"
        return repr(round(v, 9))
    if isinstance(v, np.floating):
        return repr(round(float(v), 9))
    if isinstance(v, (np.integer, int, np.bool_, bool)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.replace(tzinfo=None)
        if v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_scalar(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Mimic the driver's order-insensitive compare: sort columns by
    name, canonicalize every value to a string, sort rows."""
    df = df[sorted(df.columns)].copy()
    out = pd.DataFrame(
        {c: [_canon_scalar(v) for v in df[c].tolist()] for c in df.columns},
        dtype="object",
    )
    if len(out.columns):
        out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def assert_driver_canon_safe(schema, key: str):
    """The driver's canonicalizer hashes scalar cells only: an
    Array/Map/Struct/Binary top-level output column crashes its pandas
    sort_values (r1 red rows q_agg_collect / q_agg_approx_percentile).
    Every registered query must therefore emit flat scalar columns —
    join arrays to strings or explode them instead."""
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType, T.BinaryType))
    ]
    assert not bad, (
        f"{key}: non-scalar output columns {bad} would crash the driver "
        "canonicalizer — flatten (array_join/explode/hex) before returning"
    )


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, key: str):
    a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{key}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{key}: row count {len(a)} vs {len(b)}"
    if len(a) and not a.equals(b):
        diff_mask = (a != b).any(axis=1)
        sample = pd.concat(
            [a[diff_mask].head(5).add_suffix("_spark"),
             b[diff_mask].head(5).add_suffix("_duck")],
            axis=1,
        )
        raise AssertionError(
            f"{key}: {int(diff_mask.sum())}/{len(a)} rows differ\n{sample}"
        )
