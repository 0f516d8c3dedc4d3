"""r14 (VERDICT r13 #1): the two formerly-unconditional broadcasts -
q_text_line_dedup's hot-line mark set and q_dedup_embedding's
candidate/removal sets - are size-switched via loaders.broadcast_below
(the q_dedup_cross_corpus precedent). These tests pin both halves of
the switch:

1. the HELPER: hint applied iff the source scan's metadata bytes are
   under the threshold;
2. the SHUFFLED BRANCH: forcing every threshold to -1 (and disabling
   auto-broadcast so the planner cannot sneak the hint back from
   fixture-scale size estimates) yields byte-identical output from a
   genuinely shuffled plan - proving the 100 TB branch computes the
   same answer, the test VERDICT r13 asked for.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pudatalake_spark.loaders import broadcast_below, table

SF_DIR = "/root/testdata/sf0.001"


def _physical_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_broadcast_below_hints_only_under_threshold(spark):
    docs = table(spark, SF_DIR, "documents")
    small = docs.select("doc_id").limit(5)
    hinted = broadcast_below(small, docs, 1 << 60)
    unhinted = broadcast_below(small, docs, -1)
    # The hint lives in the analyzed logical plan as UnresolvedHint/
    # ResolvedHint; the un-hinted frame must be the SAME object (no
    # wrapper at all - zero plan overhead on the scale branch).
    assert "hint" in hinted._jdf.queryExecution().analyzed().toString().lower()
    assert unhinted is small


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_line_dedup_shuffled_branch_identical(spark, monkeypatch):
    from pudatalake_spark import registry
    from pudatalake_spark.llmops import text

    registry.load_all()
    q = registry.QUERIES["q_text_line_dedup"]
    base = _rows(q(spark, SF_DIR))

    monkeypatch.setattr(text, "LINE_HOT_BROADCAST_MAX_BYTES", -1)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        forced = q(spark, SF_DIR)
        plan = _physical_plan(forced)
        assert "BroadcastHashJoin" not in plan, (
            "forced-large branch must plan the hot-line mark join "
            "shuffled, not broadcast"
        )
        assert _rows(forced) == base
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert base, "fixture must produce per-doc line stats"


def test_dedup_embedding_shuffled_branch_identical(spark, monkeypatch):
    from pudatalake_spark import registry
    from pudatalake_spark.llmops import dedup

    registry.load_all()
    q = registry.QUERIES["q_dedup_embedding"]
    base = _rows(q(spark, SF_DIR))

    monkeypatch.setattr(dedup, "EMB_BROADCAST_MAX_BYTES", -1)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        forced = q(spark, SF_DIR)
        plan = _physical_plan(forced)
        assert "BroadcastHashJoin" not in plan, (
            "forced-large branch must plan the verify/anti joins "
            "shuffled, not broadcast"
        )
        assert _rows(forced) == base
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert base, "fixture must keep at least one survivor"
