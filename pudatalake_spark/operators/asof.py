"""Reusable as-of join (SURVEY §2.3 `q_join_asof`'s engine).

Spark has no native ASOF JOIN; this is the scalable union-tag +
running ``last(ignorenulls)`` formulation as a first-class utility:
each left row is matched to the latest right row with
``right_ts <= left_ts`` in the same key group (DuckDB
``ASOF JOIN`` / pandas ``merge_asof`` backward semantics, ties
matching).

Cost: ONE shuffle on the key + one sort of (|L|+|R|) rows - the same
profile as a native asof merge join, and it never materializes
candidate pairs (a range-join formulation is |L|x|avg right rows in
range| and blows up on dense right streams).

Property-tested against a brute-force reference on random inputs in
``tests/test_asof_property.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"
_MATCH = "__asof_match"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tolerance: Column | None = None,
) -> DataFrame:
    """Backward as-of join.

    Returns ``left`` with, per row, the payload columns of the latest
    ``right`` row of the same ``on`` key whose ``right_ts`` <=
    ``left_ts`` (NULLs when no such row). ``tolerance`` (an interval/
    numeric Column in ``left_ts`` units) additionally requires
    ``left_ts - right_ts <= tolerance``.

    Right (key, ts) pairs should be unique per payload for
    deterministic payload selection (ties on right_ts are broken by
    union order otherwise).
    """
    lcols = left.columns
    r = (
        right.select(
            F.col(on),
            F.col(right_ts).alias(left_ts),
            F.struct(F.col(right_ts).alias("__ts"), *[F.col(c) for c in payload]).alias(
                _MATCH
            ),
        )
        .withColumn(_TAG, F.lit(0))
    )
    # Align schemas for the union: left keeps its columns, right
    # carries only (key, ts, match struct); missing columns null-fill.
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r = r.select(*lcols, _TAG, F.col(_MATCH))
    l = left.withColumn(_TAG, F.lit(1)).withColumn(
        _MATCH, F.lit(None).cast(r.schema[_MATCH].dataType)
    )
    u = l.unionByName(r)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col(left_ts), F.col(_TAG))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(_MATCH, F.last(_MATCH, ignorenulls=True).over(w)).filter(
        F.col(_TAG) == 1
    )
    if tolerance is not None:
        matched = matched.withColumn(
            _MATCH,
            F.when(
                F.col(f"{_MATCH}.__ts") >= F.col(left_ts) - tolerance,
                F.col(_MATCH),
            ),
        )
    out = matched.select(
        *lcols,
        F.col(f"{_MATCH}.__ts").alias(f"{right_ts}_matched"),
        *[F.col(f"{_MATCH}.{c}").alias(c) for c in payload],
    )
    return out
