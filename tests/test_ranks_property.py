"""Hypothesis property test for the distributed global-order helper:
on RANDOM frames (duplicate-heavy values, random sizes, random bucket
fan-outs) the bucketed two-pass rank/cumsum/cummin must equal a
brute-force Python reference exactly. Complements test_ranks.py's
window-parity checks with adversarial shapes (all-equal values,
single row, values spanning fewer distinct points than buckets)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pudatalake_spark.operators.ranks import global_order

# (value, weight) rows; values deliberately collide (0..6) so ties
# cross any bucket boundary choice.
rows_strategy = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 9)),
    min_size=1,
    max_size=40,
)


def brute(rows):
    """(key -> (row_number, cumsum_w, cummin_excl_w)) over the order
    (v, k) where k is the input index."""
    order = sorted(range(len(rows)), key=lambda i: (rows[i][0], i))
    out = {}
    cum = 0
    cmin = None
    for pos, i in enumerate(order, start=1):
        v, w = rows[i]
        prev_min = cmin
        cum += w
        cmin = w if cmin is None else min(cmin, w)
        out[i] = (pos, cum, prev_min)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy, buckets=st.sampled_from([2, 3, 8, 64]))
def test_global_order_matches_brute_force(spark, rows, buckets):
    df = spark.createDataFrame(
        [(i, v, w) for i, (v, w) in enumerate(rows)],
        "k BIGINT, v BIGINT, w BIGINT",
    ).repartition(4, "k")
    got = global_order(
        df,
        "v",
        [F.col("v"), F.col("k")],
        rank_name="i",
        cumsum={"w": "cw"},
        cummin_excl={"w": "mw"},
        total_name="n",
        buckets=buckets,
    ).collect()
    want = brute(rows)
    assert len(got) == len(rows)
    for r in got:
        pos, cum, prev_min = want[r["k"]]
        assert r["i"] == pos, (r, pos)
        assert r["cw"] == cum, (r, cum)
        assert r["mw"] == prev_min, (r, prev_min)
        assert r["n"] == len(rows)
