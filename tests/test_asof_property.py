"""Property test: asof_join equals a brute-force reference on random
inputs (hypothesis-driven). This pins the union-tag + running-last
formulation's semantics - backward match, ties included, NULL when no
prior right row - independently of the fixture data."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pudatalake_spark.operators.asof import asof_join

KEYS = [0, 1, 2]

left_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 50)),
    min_size=1,
    max_size=12,
)
# Right (key, ts) unique: deterministic payload selection.
right_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 50)),
    min_size=0,
    max_size=12,
    unique=True,
)


def brute_force(lrows, rrows):
    out = []
    for i, (k, ts) in enumerate(lrows):
        prior = [(rts, rts * 10) for (rk, rts) in rrows if rk == k and rts <= ts]
        mts, val = max(prior) if prior else (None, None)
        out.append({"k": k, "ts": ts, "lid": i, "rts_matched": mts, "val": val})
    return pd.DataFrame(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lrows=left_rows, rrows=right_rows)
def test_asof_join_matches_brute_force(spark, lrows, rrows):
    left = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(lrows)], "k INT, ts INT, lid INT"
    )
    right = spark.createDataFrame(
        [(k, ts, ts * 10) for (k, ts) in rrows] or [(None, None, None)],
        "k INT, rts INT, val INT",
    )
    if not rrows:
        right = right.filter("k IS NOT NULL")
    got = (
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts", payload=["val"])
        .toPandas()
        .sort_values(["k", "ts", "lid"])
        .reset_index(drop=True)
    )
    want = (
        brute_force(lrows, rrows)
        .sort_values(["k", "ts", "lid"])
        .reset_index(drop=True)
    )
    got = got.rename(columns={"rts_matched": "rts_matched"})
    for col, wcol in [("rts_matched", "rts_matched"), ("val", "val")]:
        g = got[col].astype("float64")
        w = want[wcol].astype("float64")
        pd.testing.assert_series_equal(g, w, check_names=False)
    assert (got["k"] == want["k"]).all() and (got["ts"] == want["ts"]).all()


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lrows=left_rows, rrows=right_rows, tol=st.integers(0, 15))
def test_asof_join_tolerance_matches_brute_force(spark, lrows, rrows, tol):
    """tolerance= additionally requires left_ts - right_ts <= tol;
    matches older than the tolerance become NULL (the
    q_join_asof_tolerance semantics), verified against brute force
    on random inputs and random tolerances."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(lrows)], "k INT, ts INT, lid INT"
    )
    right = spark.createDataFrame(
        [(k, ts, ts * 10) for (k, ts) in rrows] or [(None, None, None)],
        "k INT, rts INT, val INT",
    )
    if not rrows:
        right = right.filter("k IS NOT NULL")
    got = (
        asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            payload=["val"], tolerance=F.lit(tol),
        )
        .toPandas()
        .sort_values(["k", "ts", "lid"])
        .reset_index(drop=True)
    )
    out = []
    for i, (k, ts) in enumerate(lrows):
        prior = [
            (rts, rts * 10)
            for (rk, rts) in rrows
            if rk == k and rts <= ts and ts - rts <= tol
        ]
        mts, val = max(prior) if prior else (None, None)
        out.append({"k": k, "ts": ts, "lid": i, "rts_matched": mts, "val": val})
    want = (
        pd.DataFrame(out).sort_values(["k", "ts", "lid"]).reset_index(drop=True)
    )
    for col in ("rts_matched", "val"):
        pd.testing.assert_series_equal(
            got[col].astype("float64"),
            want[col].astype("float64"),
            check_names=False,
        )


def test_asof_join_rejects_colliding_output_names(spark):
    import pytest

    left = spark.createDataFrame([(1, 10, 5)], "k INT, ts INT, val INT")
    right = spark.createDataFrame([(1, 9, 7)], "k INT, rts INT, val INT")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                  payload=["val"])
    right2 = right.withColumnRenamed("rts", "ts_m").withColumnRenamed("val", "v")
    left2 = left.withColumnRenamed("val", "ts_m_matched")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left2, right2, on="k", left_ts="ts", right_ts="ts_m",
                  payload=["v"])


def test_asof_join_tie_at_equal_right_ts_is_deterministic(spark):
    """Two right rows at the SAME (key, ts): the docstring promises the
    largest payload struct wins, independent of union/partition order."""
    left = spark.createDataFrame([(1, 10)], "k INT, ts INT")
    for order in ([(1, 9, 3), (1, 9, 8)], [(1, 9, 8), (1, 9, 3)]):
        right = spark.createDataFrame(order, "k INT, rts INT, val INT")
        got = asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", payload=["val"]
        ).collect()
        assert len(got) == 1 and got[0]["val"] == 8, order


def brute_force_forward(lrows, rrows):
    out = []
    for i, (k, ts) in enumerate(lrows):
        nxt = [(rts, rts * 10) for (rk, rts) in rrows if rk == k and rts >= ts]
        mts, val = min(nxt) if nxt else (None, None)
        out.append({"k": k, "ts": ts, "lid": i, "rts_matched": mts, "val": val})
    return pd.DataFrame(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lrows=left_rows, rrows=right_rows)
def test_asof_join_forward_matches_brute_force(spark, lrows, rrows):
    left = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(lrows)], "k INT, ts INT, lid INT"
    )
    right = spark.createDataFrame(
        [(k, ts, ts * 10) for (k, ts) in rrows] or [(None, None, None)],
        "k INT, rts INT, val INT",
    )
    if not rrows:
        right = right.filter("k IS NOT NULL")
    got = (
        asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            payload=["val"], direction="forward",
        )
        .toPandas()
        .sort_values(["k", "ts", "lid"])
        .reset_index(drop=True)
    )
    want = (
        brute_force_forward(lrows, rrows)
        .sort_values(["k", "ts", "lid"])
        .reset_index(drop=True)
    )
    for col in ["rts_matched", "val"]:
        pd.testing.assert_series_equal(
            got[col].astype("float64"), want[col].astype("float64"),
            check_names=False,
        )
    assert (got["k"] == want["k"]).all() and (got["ts"] == want["ts"]).all()
