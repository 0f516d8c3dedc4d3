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
    direction: str = "backward",
) -> DataFrame:
    """As-of join, backward (default) or forward.

    Backward: returns ``left`` with, per row, the payload columns of
    the latest ``right`` row of the same ``on`` key whose
    ``right_ts`` <= ``left_ts`` (NULLs when no such row).
    ``tolerance`` (an interval/numeric Column in ``left_ts`` units)
    additionally requires ``left_ts - right_ts <= tolerance``.

    Forward (``direction="forward"``): the EARLIEST right row with
    ``right_ts >= left_ts`` (pandas merge_asof forward semantics,
    ties matching) - the "next quote / next event after" join. Same
    union-tag shape scanned in DESCENDING ts order: every right row
    later than a left row precedes it in the scan, so the running
    ``last(ignorenulls)`` holds the smallest such right_ts when the
    left row arrives. ``tolerance`` requires
    ``right_ts - left_ts <= tolerance``.

    Output columns are ``left.columns`` + payload + ``{right_ts}_matched``;
    payload names (and the ``_matched`` name) must not collide with a
    left column - enforced here, because duplicate output names break
    any downstream select-by-name silently.

    Ties at equal ``right_ts`` within a key select the row with the
    largest payload struct (field-wise comparison, deterministic):
    the window tiebreaks on the match struct itself, so re-runs and
    different union orders give identical output even when right
    (key, ts) is not unique.
    """
    lcols = left.columns
    reserved = list(payload) + [f"{right_ts}_matched"]
    clash = sorted(set(reserved) & set(lcols))
    if clash:
        raise ValueError(
            f"asof_join: output columns {clash} collide with left columns; "
            "rename the payload (or the right_ts) before joining"
        )
    if len(set(payload)) != len(payload):
        raise ValueError(f"asof_join: duplicate payload names in {payload}")
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

    # Sort: ts, then right-before-left at equal ts (both directions
    # include ties), then the match struct so equal-ts right rows
    # resolve deterministically (left rows all carry NULL structs and
    # the same tag, so their relative order is irrelevant). Forward
    # scans ts DESCENDING with the struct order flipped so the
    # running last() holds the earliest at-or-after right row.
    if direction == "backward":
        order = [F.col(left_ts), F.col(_TAG), F.col(_MATCH)]
    elif direction == "forward":
        order = [F.col(left_ts).desc(), F.col(_TAG), F.col(_MATCH).desc()]
    else:
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(_MATCH, F.last(_MATCH, ignorenulls=True).over(w)).filter(
        F.col(_TAG) == 1
    )
    if tolerance is not None:
        in_tol = (
            F.col(f"{_MATCH}.__ts") >= F.col(left_ts) - tolerance
            if direction == "backward"
            else F.col(f"{_MATCH}.__ts") <= F.col(left_ts) + tolerance
        )
        matched = matched.withColumn(
            _MATCH, F.when(in_tol, F.col(_MATCH))
        )
    out = matched.select(
        *lcols,
        F.col(f"{_MATCH}.__ts").alias(f"{right_ts}_matched"),
        *[F.col(f"{_MATCH}.{c}").alias(c) for c in payload],
    )
    return out
