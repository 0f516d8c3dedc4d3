"""Property tests for the distributed global-order helper
(operators/ranks.py, VERDICT r6 #1): the bucketed two-pass
rank/cumsum must reproduce the single-partition window EXACTLY -
rank bijection, tie semantics, running sums, exclusive running min,
and the closed-form ntile - while its plan contains no
SinglePartition exchange feeding a Sort+Window."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from pudatalake_spark.operators.ranks import global_order, ntile_expr


def _frame(spark, n=500, dup_every=7):
    """n rows with deliberate ties (value repeats every dup_every)
    and a unique tiebreak key, shuffled across partitions."""
    rows = [
        Row(k=i, v=float((i * 37) % max(1, n // dup_every)), g=i % 3)
        for i in range(n)
    ]
    return spark.createDataFrame(rows).repartition(8, "k")


def test_row_number_bijection_and_window_parity(spark):
    df = _frame(spark)
    got = global_order(
        df, "v", [F.col("v"), F.col("k")], rank_name="i", total_name="n"
    )
    want = df.select(
        "k", F.row_number().over(Window.orderBy("v", "k")).alias("i")
    )
    joined = got.select("k", "i").join(
        want.withColumnRenamed("i", "i_win"), "k"
    )
    assert joined.filter(F.col("i") != F.col("i_win")).count() == 0
    assert got.select(F.max("n")).first()[0] == 500
    assert got.select(F.countDistinct("i")).first()[0] == 500


def test_rank_tie_semantics(spark):
    df = _frame(spark)
    got = global_order(
        df, "v", [F.col("v")], rank_name="r", rank_kind="rank"
    )
    want = df.select(
        "k", "v", F.rank().over(Window.orderBy("v")).alias("r_win")
    )
    joined = got.select("k", "r").join(want, "k")
    assert joined.filter(F.col("r") != F.col("r_win")).count() == 0


def test_cumsum_matches_window(spark):
    df = _frame(spark).withColumn("x", (F.col("k") % 11).cast("bigint"))
    got = global_order(df, "v", [F.col("v"), F.col("k")], cumsum={"x": "cx"})
    w = Window.orderBy("v", "k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.select("k", F.sum("x").over(w).alias("cx_win"))
    joined = got.select("k", "cx").join(want, "k")
    assert joined.filter(F.col("cx") != F.col("cx_win")).count() == 0


def test_cummin_excl_matches_window(spark):
    df = _frame(spark).withColumn("x", ((F.col("k") * 13) % 47).cast("bigint"))
    got = global_order(
        df, "v", [F.col("v"), F.col("k")], cummin_excl={"x": "mx"}
    )
    w = Window.orderBy("v", "k").rowsBetween(Window.unboundedPreceding, -1)
    want = df.select("k", F.min("x").over(w).alias("mx_win"))
    joined = got.select("k", "mx").join(want, "k")
    bad = joined.filter(
        ~(
            (F.col("mx") == F.col("mx_win"))
            | (F.col("mx").isNull() & F.col("mx_win").isNull())
        )
    )
    assert bad.count() == 0


def test_partitioned_cumsum_matches_window(spark):
    df = _frame(spark).withColumn("x", F.lit(1).cast("bigint"))
    got = global_order(
        df, "v", [F.col("v"), F.col("k")],
        cumsum={"x": "cx"}, partition_cols=["g"],
    )
    w = Window.partitionBy("g").orderBy("v", "k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.select("k", F.sum("x").over(w).alias("cx_win"))
    joined = got.select("k", "cx").join(want, "k")
    assert joined.filter(F.col("cx") != F.col("cx_win")).count() == 0


@pytest.mark.parametrize("tiles,n", [(4, 500), (8, 500), (10, 503), (7, 6)])
def test_ntile_expr_matches_window_ntile(spark, tiles, n):
    df = _frame(spark, n=n)
    got = global_order(
        df, "v", [F.col("v"), F.col("k")], rank_name="i", total_name="nn"
    ).select("k", ntile_expr(F.col("i"), F.col("nn"), tiles).alias("t"))
    want = df.select(
        "k", F.ntile(tiles).over(Window.orderBy("v", "k")).alias("t_win")
    )
    joined = got.join(want, "k")
    assert joined.filter(F.col("t") != F.col("t_win")).count() == 0


def test_empty_input(spark):
    df = _frame(spark).filter(F.col("k") < 0)
    got = global_order(
        df, "v", [F.col("v"), F.col("k")],
        rank_name="i", cumsum={"g": "cg"}, total_name="n",
    )
    assert got.count() == 0


def test_plan_has_no_singlepartition_window(spark):
    from pudatalake_spark.plans.audit import (
        explain_str,
        global_window_violations,
    )

    df = _frame(spark)
    got = global_order(
        df, "v", [F.col("v"), F.col("k")],
        rank_name="i", cumsum={"g": "cg"}, total_name="n",
    )
    assert global_window_violations(explain_str(got)) == []
    # And the old formulation IS caught (detector sanity).
    old = df.select(F.row_number().over(Window.orderBy("v", "k")).alias("i"))
    assert global_window_violations(explain_str(old)) != []


@pytest.mark.parametrize("buckets", [2, 8, 64])
def test_bucket_fanout_invariance(spark, buckets):
    """Ranks and cumsums are identical at ANY bucket fan-out (the
    helper's correctness must not depend on the cut points - r8:
    q_graph_kcore's K-pick runs buckets=8 over the degree histogram,
    so the non-default path is pinned too)."""
    df = _frame(spark, n=300)
    got = global_order(
        df, "v", [F.col("v"), F.col("k")],
        rank_name="i", cumsum={"v": "cv"}, buckets=buckets,
    )
    want = df.select(
        "k",
        F.row_number().over(Window.orderBy("v", "k")).alias("i"),
        F.sum("v").over(
            Window.orderBy("v", "k").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ).alias("cv"),
    )
    j = got.select("k", "i", "cv").join(
        want.withColumnRenamed("i", "iw").withColumnRenamed("cv", "cw"),
        "k",
    )
    assert j.filter(
        (F.col("i") != F.col("iw"))
        | (F.abs(F.col("cv") - F.col("cw")) > 1e-9)
    ).count() == 0
