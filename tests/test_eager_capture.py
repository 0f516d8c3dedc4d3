"""Unit tests for plan-audit global rule #4 (r8, VERDICT r7 #1): the
EagerCapture context manager must see every driver action a builder
executes at BUILD time - collect/count/toPandas/isEmpty and EAGER
localCheckpoint - record the acting frame's physical plan, and
attribute the call to its repo callsite, so tools/plan_audit.py can
apply rules #1-#3 to eager subtrees and reject undeclared actions.
The r7 blind spot this closes: q_graph_kcore's single-task K-pick
sort ran before the returned DataFrame existed and was invisible to
the returned-plan audit."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pudatalake_spark.plans.audit import (
    BOUNDED_DRIVER_ACTIONS,
    EagerCapture,
    global_window_violations,
)


def test_capture_records_actions_with_plans(spark):
    records, holder = [], {"key": "q_fake"}
    df = spark.range(100).select("id", (F.col("id") % 7).alias("v"))
    with EagerCapture(records, holder):
        df.count()
        df.limit(3).collect()  # take/head funnel through collect
        df.localCheckpoint(eager=False)  # lazy: must NOT be recorded
        holder["key"] = "q_fake2"
        df.groupBy("v").count().isEmpty()
    # after exit: actions are unpatched again
    assert df.count() == 100
    actions = [(k, a) for k, a, _, _ in records]
    assert ("q_fake", "count") in actions
    assert ("q_fake", "collect") in actions
    assert ("q_fake2", "isEmpty") in actions
    assert not any(a == "localCheckpoint" for _, a in actions)
    # every record carries a plan and a callsite in THIS file
    for key, action, callsite, plan in records:
        assert "test_eager_capture.py:" in callsite or callsite == "<external>"
        assert "== Physical Plan ==" in plan


def test_captured_plan_exposes_single_task_sort(spark):
    """The defect class rule #4 exists for: an eager action on a
    global-order window is captured WITH the SinglePartition plan,
    so the audit post-pass can flag it."""
    records, holder = [], {"key": "q_bad"}
    df = spark.range(1000).select(
        "id", (F.col("id") * 37 % 101).alias("v")
    )
    bad = df.withColumn(
        "r", F.row_number().over(Window.orderBy("v", "id"))
    )
    with EagerCapture(records, holder):
        # NOT a top-k filter: r==1 would be rewritten to
        # TakeOrderedAndProject (no single-task sort left - verified
        # r8); a lower-bound filter keeps the real Window plan.
        bad.filter(F.col("r") > 5).count()
    plans = [p for _, _, _, p in records if p]
    assert plans, "eager collect must be captured"
    assert any(global_window_violations(p) for p in plans), (
        "the captured subtree plan must show the single-task sort"
    )


def test_eager_localcheckpoint_default_is_recorded(spark):
    records, holder = [], {"key": "q_ck"}
    df = spark.range(10)
    with EagerCapture(records, holder):
        df.localCheckpoint()  # default eager=True
    assert [(k, a) for k, a, _, _ in records] == [
        ("q_ck", "localCheckpoint")
    ]


def test_bounded_driver_actions_entries_are_documented():
    for key, why in BOUNDED_DRIVER_ACTIONS.items():
        assert key.startswith(("q_", "src_", "sink_", "s_", "udf", "udtf"))
        assert len(why) > 20, f"{key}: bound must be a real sentence"
