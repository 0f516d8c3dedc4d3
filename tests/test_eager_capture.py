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

import pytest

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
    # every record carries a plan; test-code frames are outside the
    # package, so attribution is EXACTLY '<external>' (ADVICE r8: the
    # old either-or assertion was satisfiable by the fallback alone)
    for key, action, callsite, plan in records:
        assert callsite == "<external>"
        assert "== Physical Plan ==" in plan


def test_callsite_attributes_package_frames(spark):
    """The attribution path itself: an action issued from a frame
    whose co_filename lives under pudatalake_spark/ must resolve to
    that REPO-RELATIVE path (basename matching would let any file
    named loaders.py borrow the infra exemption - ADVICE r8)."""
    src = "def poke(df):\n    return df.count()\n"
    ns: dict = {}
    exec(compile(src, "/root/repo/pudatalake_spark/_synthetic.py",
                 "exec"), ns)
    records, holder = [], {"key": "q_fake"}
    with EagerCapture(records, holder):
        ns["poke"](spark.range(5))
    assert [(k, a, c) for k, a, c, _ in records] == [
        ("q_fake", "count", "pudatalake_spark/_synthetic.py:2")
    ]


def test_extended_action_surface_is_captured(spark):
    """show/tail/toLocalIterator/foreach/foreachPartition do NOT
    funnel through collect (showString / own JVM calls / RDD
    actions) and eager reliable checkpoint() executes a job - all
    were rule-#4 blind spots until r9 (ADVICE r8)."""
    records, holder = [], {"key": "q_surface"}
    df = spark.range(20)
    spark.sparkContext.setCheckpointDir("/tmp/pudl_ckpt_test")
    import contextlib
    import io as _io

    with EagerCapture(records, holder):
        with contextlib.redirect_stdout(_io.StringIO()):
            df.show(2)
        df.tail(2)
        list(df.toLocalIterator())
        df.foreach(lambda r: None)
        df.foreachPartition(lambda it: None)
        df.checkpoint()            # reliable, eager by default
        df.checkpoint(eager=False)  # lazy: must NOT be recorded
    actions = [a for _, a, _, _ in records]
    for want in ("show", "tail", "toLocalIterator", "foreach",
                 "foreachPartition"):
        assert want in actions, f"{want} evaded the capture"
    assert actions.count("checkpoint") == 1


def test_writer_v2_terminal_methods_are_captured(spark, tmp_path):
    """df.writeTo(...).createOrReplace() executes the written frame's
    plan like the v1 writer methods do - same audit contract."""
    records, holder = [], {"key": "q_v2"}
    spark.sql("CREATE DATABASE IF NOT EXISTS pudl_v2_test")
    spark.sql("DROP TABLE IF EXISTS pudl_v2_test.eager_capture_probe")
    with EagerCapture(records, holder):
        spark.range(7).writeTo(
            "pudl_v2_test.eager_capture_probe"
        ).using("parquet").create()
    assert [(k, a) for k, a, _, _ in records] == [
        ("q_v2", "write.create")
    ]
    assert "== Physical Plan ==" in records[0][3]
    spark.sql("DROP TABLE IF EXISTS pudl_v2_test.eager_capture_probe")


def test_enter_restores_on_partial_failure(spark, monkeypatch):
    """__enter__ exception safety (ADVICE r8): a failure after some
    methods were patched must restore them before re-raising -
    otherwise the wrappers leak process-wide with no __exit__."""
    from pudatalake_spark.plans import audit as audit_mod

    _DF = EagerCapture._df_class()
    before = {m: getattr(_DF, m) for m in audit_mod.EAGER_ACTION_METHODS}
    # Poison the LAST v1-writer patch target so __enter__ fails after
    # the DataFrame methods (and earlier writer methods) are wrapped.
    monkeypatch.setattr(
        audit_mod, "EAGER_WRITER_METHODS",
        audit_mod.EAGER_WRITER_METHODS + ("no_such_method",),
    )
    with pytest.raises(AttributeError):
        EagerCapture([], {}).__enter__()
    for m, fn in before.items():
        assert getattr(_DF, m) is fn, f"{m} leaked a wrapper"
    assert spark.range(3).count() == 3


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
